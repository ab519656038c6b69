package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Analytics, Quality}
import graft.sources.Tables

/** The round-13 profiling/densification family: gap-fill produces exactly
  * the per-user contiguous calendar with conserved counts, LOCF fills every
  * gap from the most recent observation, the column profile matches
  * directly-computed statistics, and the IQR screen matches a collected
  * re-computation of the Tukey fences.
  */
class ProfileDensifySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("gap fill: contiguous span per user, conserved event counts, null gaps") {
    import spark.implicits._
    val filled = Analytics.gapFillDaily(spark, dir)
      .select(col("user_id"), col("day").cast("string"), col("n_events"),
        col("day_max_cents"))
      .as[(Long, String, Long, Option[Long])].collect()
    val byUser = filled.groupBy(_._1)
    assert(byUser.nonEmpty)
    byUser.foreach { case (u, rows) =>
      val days = rows.map(r => java.time.LocalDate.parse(r._2)).sortBy(_.toEpochDay)
      // contiguous: row count equals span in days + 1, endpoints observed
      assert(days.last.toEpochDay - days.head.toEpochDay + 1 == days.length,
        s"user $u calendar has holes")
      assert(rows.minBy(r => java.time.LocalDate.parse(r._2).toEpochDay)._3 > 0,
        s"user $u span must start on an observed day")
      // zero days carry no observation; observed days carry one
      rows.foreach { r =>
        assert((r._3 == 0) == r._4.isEmpty, s"user $u day ${r._2}")
      }
    }
    // count conservation vs the raw table
    val raw = Tables.events(spark, dir).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n")).as[(Long, Long)].collect().toMap
    val gotTotals = filled.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(gotTotals == raw)
  }

  test("LOCF: no nulls, observed days keep their value, gaps inherit the last one") {
    import spark.implicits._
    val f = Analytics.locfDaily(spark, dir)
      .select(col("user_id"), col("day").cast("string"), col("n_events"),
        col("filled_max_cents"))
      .as[(Long, String, Long, Option[Long])].collect()
    assert(f.forall(_._4.nonEmpty), "LOCF must leave no nulls")
    val obs = Analytics.gapFillDaily(spark, dir)
      .select(col("user_id"), col("day").cast("string"), col("day_max_cents"))
      .as[(Long, String, Option[Long])].collect()
      .collect { case (u, d, Some(v)) => (u, d) -> v }.toMap
    f.groupBy(_._1).foreach { case (u, rows) =>
      var carried = Option.empty[Long]
      rows.sortBy(r => java.time.LocalDate.parse(r._2).toEpochDay).foreach { r =>
        obs.get((u, r._2)) match {
          case Some(v) => assert(r._4.contains(v)); carried = Some(v)
          case None    => assert(r._4 == carried, s"user $u day ${r._2}")
        }
      }
    }
  }

  test("column profile matches directly-computed statistics") {
    import spark.implicits._
    val prof = Quality.profileColumns(Tables.events(spark, dir))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    val e = Tables.events(spark, dir)
    val n = e.count()
    assert(prof.values.forall(_._2 == n))
    assert(prof.keySet == Set("event_id", "user_id", "event_type",
      "value_cents", "ts_us"))
    // event_id is the unique key: zero nulls, all-distinct
    assert(prof("event_id")._3 == 0 && prof("event_id")._4 == n)
    val Seq(loT, hiT) = e.agg(min("event_type"), max("event_type")).head()
      .toSeq.map(_.toString)
    assert(prof("event_type")._5 == loT && prof("event_type")._6 == hiT)
    val users = e.select(col("user_id")).distinct().count()
    assert(prof("user_id")._4 == users)
    // numeric min/max render via the native type, not string ordering
    val Seq(loV, hiV) = e.agg(
      min(round(col("value") * 100).cast("long")),
      max(round(col("value") * 100).cast("long"))).head().toSeq.map(_.toString)
    assert(prof("value_cents")._5 == loV && prof("value_cents")._6 == hiV)
  }

  test("IQR screen matches a collected re-computation of the Tukey fences") {
    import spark.implicits._
    val got = Quality.valueOutliers(Tables.events(spark, dir))
      .as[(String, Double, Double, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    val cents = Tables.events(spark, dir)
      .select(col("event_type"), round(col("value") * 100).cast("long").as("c"))
      .as[(String, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(got.keySet == cents.keySet)
    cents.foreach { case (t, vs) =>
      val sorted = vs.sorted
      def q(p: Double): Double = {
        val pos = (sorted.length - 1) * p
        val lo = sorted(pos.toInt).toDouble
        val hi = sorted(math.min(pos.toInt + 1, sorted.length - 1)).toDouble
        lo + (hi - lo) * (pos - pos.toInt)
      }
      val (q1, q3) = (q(0.25), q(0.75))
      val (loF, hiF) = (q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1))
      val expOut = vs.count(v => v < loF || v > hiF)
      val r = got(t)
      assert(r._2 == q1 && r._3 == q3, s"$t quartiles")
      assert(r._4 == vs.length && r._5 == expOut, s"$t outlier count")
      val expMax = vs.filter(_ > hiF) match {
        case a if a.isEmpty => None
        case a              => Some(a.max)
      }
      assert(r._6 == expMax, s"$t max outlier")
    }
  }
}
