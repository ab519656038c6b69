package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Upsert

/** Partition-pruned incremental upsert: merge correctness (update wins,
  * insert lands, delta beats existing on order ties), and the scale
  * contract — untouched partition directories are byte-identical after
  * the merge, touched ones are rewritten.
  */
class UpsertSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def seedTable(path: String): Unit =
    Seq(
      ("d1", 1L, 10.0, 100L), ("d1", 2L, 20.0, 100L),
      ("d2", 3L, 30.0, 100L), ("d2", 4L, 40.0, 100L),
      ("d3", 5L, 50.0, 100L),
      ("d4", 6L, 60.0, 100L), ("d4", 7L, 70.0, 100L),
      ("d5", 8L, 80.0, 100L))
      .toDF("day", "id", "value", "version")
      .write.mode(SaveMode.Overwrite).partitionBy("day").parquet(path)

  private def partFiles(path: String): Map[String, Set[(String, Long)]] =
    new java.io.File(path).listFiles().filter(_.getName.startsWith("day="))
      .map(d => d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified())).toSet).toMap

  test("upsert rewrites only the touched partitions; merge keeps latest per key") {
    val path = Files.createTempDirectory("graft-upsert").toString + "/t"
    seedTable(path)
    val before = partFiles(path)

    val delta = Seq(
      ("d2", 3L, 31.0, 101L),  // update: newer version wins
      ("d2", 9L, 90.0, 101L),  // insert into existing partition
      ("d4", 6L, 61.0, 100L),  // SAME version: delta must win the tie
      ("d6", 10L, 99.0, 101L)) // brand-new partition
      .toDF("day", "id", "value", "version")

    val stats = Upsert.upsertPartitions(spark, delta, path, "day",
      keys = Seq("id"), order = Seq("version"))
    assert(stats.touchedPartitions == Seq("d2", "d4", "d6"))
    assert(stats.deltaRows == 4)

    val after = partFiles(path)
    // the 100-TB contract: work scales with the delta — partitions the
    // batch never mentioned are not listed, read, or replaced
    Seq("day=d1", "day=d3", "day=d5").foreach { p =>
      assert(after(p) == before(p), s"untouched partition $p was rewritten")
    }
    Seq("day=d2", "day=d4").foreach { p =>
      assert(after(p) != before(p), s"touched partition $p was not rewritten")
    }
    assert(after.contains("day=d6"), "new partition must be created")

    val rows = spark.read.parquet(path)
      .select("day", "id", "value", "version").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(rows == Set(
      ("d1", 1L, 10.0, 100L), ("d1", 2L, 20.0, 100L),
      ("d2", 3L, 31.0, 101L), ("d2", 4L, 40.0, 100L), ("d2", 9L, 90.0, 101L),
      ("d3", 5L, 50.0, 100L),
      ("d4", 6L, 61.0, 100L), ("d4", 7L, 70.0, 100L),
      ("d5", 8L, 80.0, 100L),
      ("d6", 10L, 99.0, 101L)))

    // idempotency: replaying the same batch converges (delta wins its own
    // ties, so the rewrite produces identical content)
    Upsert.upsertPartitions(spark, delta, path, "day",
      keys = Seq("id"), order = Seq("version"))
    val replay = spark.read.parquet(path)
      .select("day", "id", "value", "version").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(replay == rows, "replaying the same delta must be a no-op on content")
  }

  test("stale delta rows lose to newer existing rows") {
    val path = Files.createTempDirectory("graft-upsert-stale").toString + "/t"
    seedTable(path)
    val stale = Seq(("d1", 1L, -1.0, 99L)).toDF("day", "id", "value", "version")
    Upsert.upsertPartitions(spark, stale, path, "day",
      keys = Seq("id"), order = Seq("version"))
    val v = spark.read.parquet(path).filter(col("id") === 1L)
      .select("value", "version").collect().map(r => (r.getDouble(0), r.getLong(1)))
    assert(v.toSeq == Seq((10.0, 100L)),
      "a lower-version delta row must not clobber the newer existing row")
  }
}
