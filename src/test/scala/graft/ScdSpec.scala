package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scd

/** SCD Type-2 semantics: consecutive equal observations collapse into one
  * validity-bounded run; runs chain through `effective_to`; only the last
  * run per key is current. Plus the operator's scale contract: ONE hash
  * shuffle for the whole history build.
  */
class ScdSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(minute * 60000L)

  private val obs = Seq(
    // user 1: A A B A — three runs, the middle B a single observation
    (1L, 10L, ts(1), "A"), (1L, 11L, ts(2), "A"),
    (1L, 12L, ts(3), "B"), (1L, 13L, ts(4), "A"),
    // user 2: a single never-changed attribute
    (2L, 20L, ts(1), "X")
  ).toDF("user_id", "event_id", "ts", "event_type")

  test("runs collapse with correct validity bounds, counts, currency") {
    val out = Scd.userTypeHistory(obs)
      .orderBy("user_id", "version")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("version"),
        r.getAs[String]("event_type"), r.getAs[Long]("effective_from_us"),
        Option(r.getAs[java.lang.Long]("effective_to_us")).map(_.toLong),
        r.getAs[Long]("n_events"), r.getAs[Boolean]("is_current")))
      .toSeq
    def us(minute: Int) = minute * 60000000L
    assert(out == Seq(
      (1L, 1L, "A", us(1), Some(us(3)), 2L, false),
      (1L, 2L, "B", us(3), Some(us(4)), 1L, false),
      (1L, 3L, "A", us(4), None, 1L, true),
      (2L, 1L, "X", us(1), None, 1L, true)))
  }

  test("validity intervals tile each key's timeline with no gap or overlap") {
    val fact = graft.operators.Dedup.latestEvents(
      graft.sources.Tables.events(spark, "/root/testdata/sf0.001"))
    val hist = Scd.userTypeHistory(fact).collect()
      .groupBy(_.getAs[Long]("user_id"))
    hist.foreach { case (_, runs) =>
      val sorted = runs.sortBy(_.getAs[Long]("version"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[java.lang.Long]("effective_to_us") ==
            b.getAs[java.lang.Long]("effective_from_us"),
            "next run must start exactly where the previous closed")
        case _ =>
      }
      assert(sorted.init.forall(!_.getAs[Boolean]("is_current")))
      assert(sorted.last.getAs[Boolean]("is_current"))
      assert(sorted.last.get(sorted.last.fieldIndex("effective_to_us")) == null)
    }
  }

  test("the whole history build rides a single hash shuffle on the key") {
    val plan = Scd.userTypeHistory(obs).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"expected exactly one hash exchange (key-partitioned windows share " +
        s"it; change-row filter and run numbering only re-sort locally), " +
        s"got $exchanges:\n$plan")
  }
}
