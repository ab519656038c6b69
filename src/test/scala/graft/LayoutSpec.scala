package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Layout
import graft.sources.Tables

/** Z-order layout: correctness (layout is semantics-free) and the skipping
  * claim MEASURED — row groups actually pruned on the second clustered
  * dimension, where the linear layout it replaces scans everything.
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.01"

  private lazy val (zPath, linPath, events) = {
    val ev = Tables.events(spark, sf)
    val base = Files.createTempDirectory("graft-layout").toString
    Layout.zorderWrite(ev, s"$base/z", Seq("user_id", "value"), numFiles = 64)
    Layout.linearWrite(ev, s"$base/lin", Seq("user_id", "value"), numFiles = 64)
    (s"$base/z", s"$base/lin", ev)
  }

  /** Rows the scan node emitted after parquet row-group skipping — the
    * data-skipping evidence (surviving row groups' rows; the Filter above
    * the scan re-filters to the exact result).
    */
  private def scannedRows(df: DataFrame): Long = {
    df.queryExecution.toRdd.count()
    val p = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    p.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head.metrics("numOutputRows").value
  }

  test("z-order is semantics-free: read-back equals the source table") {
    def key(df: DataFrame): Set[(Long, Long)] =
      df.select(col("event_id"), unix_micros(col("ts")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(key(spark.read.parquet(zPath)) == key(events))
  }

  test("z-value interleaves monotonically per dimension") {
    import spark.implicits._
    val df = Seq((0.0, 0.0), (0.0, 100.0), (100.0, 0.0), (100.0, 100.0))
      .toDF("x", "y")
    val z = df.select(Layout.zValue(Seq(col("x"), col("y")),
      Seq(0.0, 0.0), Seq(100.0, 100.0), bits = 8).as("z"))
      .collect().map(_.getLong(0))
    // corners: (0,0) lowest, (max,max) highest, mixed corners between
    assert(z(0) == 0L && z(3) == (1L << 16) - 1)
    assert(z(1) > z(0) && z(2) > z(0) && z(3) > z(1) && z(3) > z(2))
  }

  test("row-group skipping engages on the SECOND dimension (linear cannot)") {
    val pred = col("value").between(50.0, 60.0)
    val zScan = scannedRows(spark.read.parquet(zPath).filter(pred))
    val linScan = scannedRows(spark.read.parquet(linPath).filter(pred))
    val total = events.count()
    assert(linScan == total,
      s"linear layout (sorted by user_id) should scan everything for a value " +
        s"predicate: scanned $linScan of $total")
    assert(zScan * 2 <= total,
      s"z-order should skip at least half the row groups: scanned $zScan of $total")
  }

  test("2-D predicate prunes harder than either dimension alone") {
    val both = scannedRows(spark.read.parquet(zPath)
      .filter(col("user_id").between(3, 7) && col("value").between(50.0, 150.0)))
    val one = scannedRows(spark.read.parquet(zPath)
      .filter(col("value").between(50.0, 150.0)))
    assert(both <= one)
    assert(both * 4 <= events.count(),
      s"2-D predicate should scan <= 1/4 of the table: $both of ${events.count()}")
  }
}
