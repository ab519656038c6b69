package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Upsert
import graft.streaming.VersionedCommitter

/** Lossless type widening through schema evolution: a widened committed
  * schema reads pre-widening data dirs in place (Spark 4's parquet reader
  * promotes int32→int64 etc. against a wider bound schema); narrow
  * late-arriving deltas upcast at the write seam; the change feed aligns
  * across the widening without phantom updates; non-widening changes
  * refuse.
  */
class TypeWideningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("int -> long widening reads old dirs in place; narrow deltas upcast") {
    val path = Files.createTempDirectory("graft-tw").toString + "/t"
    val c = new VersionedCommitter
    // v1: v is INT
    Upsert.upsertPartitionsAtomic(spark,
      Seq(("d1", 1L, 10), ("d2", 2L, 20)).toDF("day", "id", "v"),
      path, "day", Seq("id"), Seq("v"), c)
    assert(Upsert.readTable(spark, path, c).schema("v").dataType ==
      org.apache.spark.sql.types.IntegerType)

    // v2: a LONG delta widens the committed schema; d2's dir is untouched
    val m1 = graft.streaming.AtomicRenameCommitter.readManifest(path)
    Upsert.upsertPartitionsAtomic(spark,
      Seq(("d1", 3L, 5_000_000_000L)).toDF("day", "id", "v"),
      path, "day", Seq("id"), Seq("v"), c)
    val m2 = graft.streaming.AtomicRenameCommitter.readManifest(path)
    assert(m2("d2") == m1("d2"), "widening must not rewrite untouched dirs")
    val t = Upsert.readTable(spark, path, c)
    assert(t.schema("v").dataType == org.apache.spark.sql.types.LongType)
    assert(t.selectExpr("id", "v").as[(Long, Long)].collect().toSet ==
      Set((1L, 10L), (2L, 20L), (3L, 5_000_000_000L)))

    // a narrow INT delta after the widening upcasts and merges
    Upsert.upsertPartitionsAtomic(spark,
      Seq(("d2", 2L, 21)).toDF("day", "id", "v"),
      path, "day", Seq("id"), Seq("v"), c)
    val t2 = Upsert.readTable(spark, path, c)
    assert(t2.schema("v").dataType == org.apache.spark.sql.types.LongType)
    assert(t2.filter(col("id") === 2L).selectExpr("v").as[Long].head() == 21L)

    // as-of the pre-widening version keeps the narrow contemporaneous type
    assert(Upsert.readTableAsOf(spark, path, 1L, c).schema("v").dataType ==
      org.apache.spark.sql.types.IntegerType)

    // CDF across the widening: pre-state aligns to the widened type, and
    // the unchanged d2 row does NOT appear as a phantom update
    val ch = Upsert.tableChanges(spark, path, 1L, 2L, Seq("id"), c)
      .selectExpr("id", "v", "change_type").as[(Long, Long, String)]
      .collect().toSet
    assert(ch == Set((3L, 5_000_000_000L, "insert")), s"got $ch")
  }

  test("float -> double widens; non-widening changes refuse") {
    val path = Files.createTempDirectory("graft-tw").toString + "/t"
    Upsert.upsertPartitionsAtomic(spark,
      Seq(("d1", 1L, 1.5f)).toDF("day", "id", "x"),
      path, "day", Seq("id"), Seq("x"))
    Upsert.upsertPartitionsAtomic(spark,
      Seq(("d1", 2L, 2.25)).toDF("day", "id", "x"),
      path, "day", Seq("id"), Seq("x"))
    val t = Upsert.readTable(spark, path)
    assert(t.schema("x").dataType == org.apache.spark.sql.types.DoubleType)
    assert(t.selectExpr("x").as[Double].collect().toSet == Set(1.5, 2.25))

    intercept[IllegalArgumentException] { // dropping a column stays refused
      Upsert.upsertPartitionsAtomic(spark,
        Seq(("d1", 3L)).toDF("day", "id"), path, "day", Seq("id"), Seq("id"))
    }
    intercept[IllegalArgumentException] { // double -> string is not a widening
      Upsert.upsertPartitionsAtomic(spark,
        Seq(("d1", 3L, "nope")).toDF("day", "id", "x"),
        path, "day", Seq("id"), Seq("x"))
    }
  }
}
