package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Upsert
import graft.streaming.AtomicRenameCommitter

/** CHECK constraints on the manifest commit: declared invariants are
  * validated against the STAGED bytes before every flip — a violating
  * commit aborts with the previous table intact; NULL passes (SQL CHECK);
  * adding a constraint the current data violates is rejected.
  */
class ConstraintsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(path: String): Set[(String, Long, Long)] =
    Upsert.readTable(spark, path)
      .selectExpr("day", "id", "version").as[(String, Long, Long)].collect().toSet

  private def upsert(path: String, t: (String, Long, Long)*): Unit =
    Upsert.upsertPartitionsAtomic(spark,
      t.map { case (d, i, v) => (d, i, v.toDouble, v) }
        .toDF("day", "id", "value", "version"),
      path, "day", keys = Seq("id"), order = Seq("version"))

  test("a violating commit aborts atomically; conforming commits pass; drop lifts the gate") {
    val path = Files.createTempDirectory("graft-chk").toString + "/t"
    upsert(path, ("d1", 1L, 100L))
    Upsert.addConstraint(spark, path, "version_positive", "version > 0")
    assert(Upsert.constraints(path) == Map("version_positive" -> "version > 0"))

    // conforming delta commits normally, constraint carried forward
    upsert(path, ("d1", 2L, 101L))
    assert(Upsert.constraints(path).contains("version_positive"))

    // violating delta: commit aborts, table unchanged, staging abandoned
    val before = rows(path)
    val e = intercept[Upsert.CheckViolationException] {
      upsert(path, ("d2", 3L, -5L))
    }
    assert(e.counts == Map("version_positive" -> 1L))
    assert(rows(path) == before, "an aborted commit must leave the table as it was")
    assert(!AtomicRenameCommitter.readManifest(path).contains("d2"))

    Upsert.dropConstraint(path, "version_positive")
    upsert(path, ("d2", 3L, -5L)) // now admissible
    assert(rows(path).contains(("d2", 3L, -5L)))
  }

  test("NULL passes (SQL CHECK), and adding a constraint the current data violates is rejected") {
    val path = Files.createTempDirectory("graft-chk").toString + "/t"
    val withNull = Seq((Some(600L), 5L), (None, 6L)).map { case (v, i) => ("d4", i, v) }
      .toDF("day", "id", "version")
      .withColumn("value", org.apache.spark.sql.functions.lit(1.0))
      .select("day", "id", "value", "version")
    Upsert.replacePartitionsAtomic(spark, withNull, path, "day", Seq("d4"))
    // version > 500 is FALSE for nothing, NULL for id=6 → both pass
    Upsert.addConstraint(spark, path, "big_version", "version > 500")
    // but a constraint the null row's sibling violates is rejected up front
    val e = intercept[IllegalArgumentException] {
      Upsert.addConstraint(spark, path, "small_version", "version < 100")
    }
    assert(e.getMessage.contains("existing rows violate"))
    assert(!Upsert.constraints(path).contains("small_version"))
  }

  test("whole-table snapshots enforce and carry constraints too") {
    val path = Files.createTempDirectory("graft-chk").toString + "/t"
    Upsert.writeTableAtomic(spark, Seq((1L, "a")).toDF("id", "v"), path)
    Upsert.addConstraint(spark, path, "id_positive", "id > 0")
    val before = Upsert.readTable(spark, path).count()
    intercept[Upsert.CheckViolationException] {
      Upsert.writeTableAtomic(spark, Seq((-1L, "b")).toDF("id", "v"), path)
    }
    assert(Upsert.readTable(spark, path).count() == before)
    Upsert.writeTableAtomic(spark, Seq((2L, "b")).toDF("id", "v"), path)
    assert(Upsert.constraints(path).contains("id_positive"),
      "a whole-table snapshot must carry the constraints forward")
  }
}
