package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)
  case class SessionState(start_us: Long, end_us: Long, n: Long)
  case class CompletedSession(user_id: Long, session_start_us: Long,
                              session_end_us: Long, n_events: Long)

  /** Streaming gap-based sessionization — the continuous form of
    * [[graft.operators.Analytics.sessionize]]: flatMapGroupsWithState with
    * an EVENT-TIME timeout. A session closes (and emits) when the watermark
    * passes its last event + the gap. Events inside one micro-batch are
    * folded into gap-separated spans, then merged with the open state span
    * by interval distance — so a within-watermark event that arrives EARLIER
    * than the open session's start extends the session backwards (or forms
    * its own earlier span) instead of being glued to the span's end.
    *
    * Equivalence with the batch operator holds when each session's events
    * have all arrived by the time a LATER gap-separated span shows up for
    * the same key (completed spans emit on that batch; an even-later
    * within-watermark straggler that would have bridged an already-emitted
    * span is a genuine streaming/batch divergence — eliminating it requires
    * buffering every span until the watermark, i.e. state linear in open
    * spans, not one record). State per key is one small open-session record,
    * hash-partitioned across executors and evicted by the timeout — bounded
    * by (active users × 1).
    */
  def streamingSessions(events: Dataset[SessionEvent],
                        gapMinutes: Int = 30): Dataset[CompletedSession] = {
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[CompletedSession]
    implicit val keyEnc = Encoders.scalaLong
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, CompletedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user, evs, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(CompletedSession(user, s.start_us, s.end_us, s.n))
          } else {
            // full µs from the Timestamp's (second, nano) pair — getTime is
            // ms-floored and would silently quantize µs event times,
            // breaking ≡ with the µs batch operator on sub-ms data
            val times = evs.map { e =>
              val i = e.ts.toInstant
              i.getEpochSecond * 1000000L + i.getNano / 1000L
            }.toArray.sorted
            val batchSpans = scala.collection.mutable.ArrayBuffer.empty[SessionState]
            times.foreach { t =>
              if (batchSpans.nonEmpty && t - batchSpans.last.end_us <= gapUs) {
                val s = batchSpans.last
                batchSpans(batchSpans.length - 1) =
                  SessionState(s.start_us, math.max(s.end_us, t), s.n + 1)
              } else batchSpans += SessionState(t, t, 1L)
            }
            // merge the open state span with the batch spans by interval
            // distance (sorted by start): state may fall before, between, or
            // after the batch's spans
            val all = (state.getOption.toSeq ++ batchSpans).sortBy(_.start_us)
            val spans = scala.collection.mutable.ArrayBuffer.empty[SessionState]
            all.foreach { sp =>
              if (spans.nonEmpty && sp.start_us - spans.last.end_us <= gapUs) {
                val s = spans.last
                spans(spans.length - 1) = SessionState(
                  math.min(s.start_us, sp.start_us),
                  math.max(s.end_us, sp.end_us), s.n + sp.n)
              } else spans += sp
            }
            val open = spans.last
            state.update(open)
            state.setTimeoutTimestamp(open.end_us / 1000L + gapMinutes * 60000L)
            spans.init.iterator
              .map(s => CompletedSession(user, s.start_us, s.end_us, s.n))
          }
      }
  }

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
