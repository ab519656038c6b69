package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Upsert
import graft.sources.ManifestTable
import graft.streaming.VersionedCommitter

/** Generated partition columns (Delta's generated-column pruning): the
  * manifest declares `partCol = f(srcCol)` for a MONOTONIC transform f,
  * and the declarative FileIndex converts pushed range/point filters on
  * the SOURCE column into exact intervals on the partition VALUE — no
  * per-partition stats involved. The declaration is an enforced
  * invariant: declare-time validation scans the committed table, and
  * every later partition-staging commit re-validates its staged bytes.
  */
class GenPartSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scanFiles(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    TestSpark.fileScanNodes(df.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum
  }

  /** six single-file partitions p = v div 100, v ∈ {0..599 step 50}. */
  private def build(): (String, VersionedCommitter) = {
    val path = Files.createTempDirectory("graft-gp").toString + "/t"
    val c = new VersionedCommitter
    val rows = (0L until 600L by 50L).map(v => (v, v / 100L, s"r$v"))
    Upsert.replacePartitionsAtomic(spark,
      rows.toDF("v", "p", "tag")
        .withColumn("p", col("p").cast("string")).coalesce(1),
      path, "p", (0L to 5L).map(_.toString), committer = c)
    Upsert.declareGeneratedPartition(spark, path, "v", "div:100", c)
    (path, c)
  }

  test("JVM and Column transform forms agree, including negatives and huge values") {
    val samples = Seq(Long.MinValue / 4, -86400000001L, -1L, 0L, 1L,
      86399999999L, 86400000000L, 1700003L * 1000000L,
      1700000000L * 1000000L, Long.MaxValue / 4)
    for (t <- Seq("yyyymmdd_us", "days_us", "div:100", "div:7")) {
      val jvm = samples.map(s => Upsert.genTransform(t)(s))
      val viaCol = samples.toDF("src")
        .select(Upsert.generatedPartitionColumn("src", t)).as[Long].collect().toSeq
      assert(viaCol == jvm, s"transform $t drifts between planner and writer")
      // monotone nondecreasing over the sample (sorted input stays sorted)
      assert(jvm == jvm.sorted, s"transform $t is not monotonic")
    }
  }

  test("pushed source-column filters prune partitions through the declaration") {
    val (path, c) = build()
    val t = ManifestTable.readTableIndexed(spark, path, c)
    val all = scanFiles(ManifestTable.readTableIndexed(spark, path, c))
    assert(all == 6L, s"one file per partition expected, got $all")
    // v in [230, 320] → p ∈ {2, 3}: two partitions listed, not six
    val q = t.filter(col("v").between(230L, 320L))
    assert(q.select("v").as[Long].collect().toSet == Set(250L, 300L))
    assert(scanFiles(q) == 2L, "interval must pin p ∈ {2,3}")
    // equality pins a single partition
    val eq = t.filter(col("v") === 550L)
    assert(eq.select("tag").as[String].collect().toSeq == Seq("r550"))
    assert(scanFiles(eq) == 1L)
    // contradictory conjuncts keep nothing
    val none = t.filter(col("v") > 300L && col("v") < 250L)
    assert(none.count() == 0L && scanFiles(none) == 0L)
    // an unbounded side prunes only the bounded one
    val ge = t.filter(col("v") >= 500L)
    assert(ge.count() == 2L)
    assert(scanFiles(ge) == 1L, "v ≥ 500 is exactly partition 5")
  }

  test("declaration over drifted data is refused; writes re-validate the invariant") {
    val path = Files.createTempDirectory("graft-gp").toString + "/t"
    val c = new VersionedCommitter
    Upsert.replacePartitionsAtomic(spark,
      Seq((120L, "1"), (421L, "9")).toDF("v", "p"), // 421 div 100 = 4, not 9
      path, "p", Seq("1", "9"), committer = c)
    intercept[IllegalArgumentException] {
      Upsert.declareGeneratedPartition(spark, path, "v", "div:100", c)
    }
    // a clean table declares fine, then a drifting write is aborted
    val (good, gc) = build()
    intercept[IllegalArgumentException] {
      Upsert.replacePartitionsAtomic(spark,
        Seq((50L, "3")).toDF("v", "p").withColumn("tag", lit("bad")),
        good, "p", Seq("3"), committer = gc)
    }
    // the abort left the previous state fully intact
    assert(Upsert.readTable(spark, good, gc).count() == 12L)
    // a conforming write passes and stays prunable (partition 3's rows
    // v=300,350 are REPLACED by v=310,350)
    Upsert.replacePartitionsAtomic(spark,
      Seq((310L, "3"), (350L, "3")).toDF("v", "p")
        .withColumn("tag", lit("new")).coalesce(1),
      good, "p", Seq("3"), committer = gc)
    val q = ManifestTable.readTableIndexed(spark, good, gc)
      .filter(col("v").between(300L, 399L))
    assert(q.select("v").as[Long].collect().toSet == Set(310L, 350L))
    assert(scanFiles(q) == 1L)
  }

  test("yyyymmdd_us: a timestamp window prunes day partitions exactly") {
    val path = Files.createTempDirectory("graft-gp").toString + "/t"
    val c = new VersionedCommitter
    val day0 = 1700000000000000L // 2023-11-14T22:13:20Z
    val rows = (0 until 8).map { i =>
      val ts = day0 + i.toLong * 86400000000L
      (ts, Upsert.genTransform("yyyymmdd_us")(ts).toString)
    }
    Upsert.replacePartitionsAtomic(spark, rows.toDF("ts_us", "day").coalesce(1),
      path, "day", rows.map(_._2), committer = c)
    Upsert.declareGeneratedPartition(spark, path, "ts_us", "yyyymmdd_us", c)
    val q = ManifestTable.readTableIndexed(spark, path, c)
      .filter(col("ts_us").between(day0 + 2L * 86400000000L,
        day0 + 4L * 86400000000L))
    assert(q.count() == 3L)
    assert(scanFiles(q) == 3L, "three calendar days — three partitions listed")
  }

  test("a partition-spec change drops the declaration (it described the old layout)") {
    val (path, c) = build()
    Upsert.repartitionTable(spark, path, "tag", c)
    assert(Upsert.tableMeta(path, c).get("genpart").isEmpty,
      "repartition must drop the generated-partition declaration")
    // reads over the new layout stay correct, just unpruned by v
    assert(Upsert.readTable(spark, path, c).count() == 12L)
  }
}
