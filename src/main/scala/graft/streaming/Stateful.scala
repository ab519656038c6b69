package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Custom streaming state via `KeyValueGroupedDataset.mapGroupsWithState`
  * (SURVEY.md §2.9 — beyond the reference's dedup-only state, this is the
  * engine's arbitrary-stateful surface). Running per-user totals: state is
  * one small record per key, hash-partitioned across executors, updated
  * once per micro-batch.
  */
object Stateful {

  case class UserEvent(user_id: Long, value: Double)
  case class UserTotalState(n: Long, sum: Double)
  case class UserTotal(user_id: Long, n_events: Long, sum_value: Double)

  def runningUserTotals(events: Dataset[UserEvent]): Dataset[UserTotal] = {
    implicit val stateEnc = Encoders.product[UserTotalState]
    implicit val outEnc = Encoders.product[UserTotal]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserTotalState, UserTotal](GroupStateTimeout.NoTimeout) {
        (user, evs, state: GroupState[UserTotalState]) =>
          val prev = state.getOption.getOrElse(UserTotalState(0L, 0.0))
          var n = prev.n
          var sum = prev.sum
          evs.foreach { e => n += 1; sum += e.value }
          val next = UserTotalState(n, sum)
          state.update(next)
          UserTotal(user, next.n, next.sum)
      }
  }
}
