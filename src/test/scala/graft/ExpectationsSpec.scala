package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Expectations, Upsert}
import graft.streaming.VersionedCommitter

/** Write-time expectations: violating ROWS quarantine with an audit tag,
  * clean rows land, CHECK-style null semantics, and the append primitive
  * both paths ride.
  */
class ExpectationsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rules = Map(
    "score_le_100" -> (col("score") <= 100L),
    "name_present" -> col("name").isNotNull)

  test("rows are tagged with every rule they break, sorted; NULL rule results pass") {
    val df = Seq(
      (1L, Some("a"), 50L),   // clean
      (2L, None, 50L),        // name_present fails
      (3L, Some("c"), 200L),  // score_le_100 fails
      (4L, None, 200L)        // both fail
    ).toDF("id", "name", "score")
    // NULL semantics: score IS NULL would make score_le_100 NULL → pass
    val withNull = df.union(Seq((5L, Some("e"), null.asInstanceOf[java.lang.Long]))
      .toDF("id", "name", "score").selectExpr("id", "name", "CAST(score AS BIGINT)"))
    val tagged = Expectations.flagViolations(withNull, rules)
      .selectExpr("id", "array_join(failed_rules, ',') AS f")
      .as[(Long, String)].collect().toMap
    assert(tagged == Map(1L -> "", 2L -> "name_present", 3L -> "score_le_100",
      4L -> "name_present,score_le_100", 5L -> ""))
  }

  test("writeWithExpectations splits, quarantines with audit CSV, and appends accumulate") {
    val root = Files.createTempDirectory("graft-exp").toString
    val (path, qPath) = (root + "/t", root + "/q")
    val (c, qc) = (new VersionedCommitter, new VersionedCommitter)
    val b1 = Seq((1L, Some("a"), 50L), (2L, None, 50L)).toDF("id", "name", "score")
    val st1 = Expectations.writeWithExpectations(spark, b1, path, qPath, rules, c, qc)
    assert(st1 == Expectations.ExpectationStats(1L, 1L))
    val b2 = Seq((3L, Some("c"), 200L), (4L, Some("d"), 60L)).toDF("id", "name", "score")
    val st2 = Expectations.writeWithExpectations(spark, b2, path, qPath, rules, c, qc)
    assert(st2 == Expectations.ExpectationStats(1L, 1L))
    // both batches' clean rows accumulated (append, not overwrite)
    assert(Upsert.readTable(spark, path, c).select("id")
      .as[Long].collect().toSet == Set(1L, 4L))
    // quarantine carries the rows AND what they broke
    assert(Upsert.readTable(spark, qPath, qc)
      .selectExpr("id", "failed_rules").as[(Long, String)].collect().toSet ==
      Set((2L, "name_present"), (3L, "score_le_100")))
    // history labels: every landing is an audited `append`
    assert(Upsert.tableHistory(spark, path, c)
      .select("operation").as[String].collect().forall(_ == "append"))
    // an all-clean batch never touches the quarantine table's history
    val qVersions = qc.versions(qPath).size
    Expectations.writeWithExpectations(spark,
      Seq((5L, Some("e"), 1L)).toDF("id", "name", "score"), path, qPath, rules, c, qc)
    assert(qc.versions(qPath).size == qVersions)
  }

  test("appendTableAtomic refuses partition-managed tables and keeps time travel") {
    val root = Files.createTempDirectory("graft-exp").toString
    val path = root + "/t"
    val c = new VersionedCommitter
    Upsert.appendTableAtomic(spark, Seq((1L, "a")).toDF("id", "v"), path, c)
    Upsert.appendTableAtomic(spark, Seq((2L, "b")).toDF("id", "v"), path, c)
    assert(Upsert.readTableAsOf(spark, path, 1L, c)
      .select("id").as[Long].collect().toSeq == Seq(1L))
    assert(Upsert.readTable(spark, path, c)
      .select("id").as[Long].collect().toSet == Set(1L, 2L))
    // a partition-managed table refuses appends
    val pPath = root + "/p"
    Upsert.upsertPartitionsAtomic(spark,
      Seq(("d1", 1L, 1L)).toDF("day", "id", "version"), pPath, "day",
      keys = Seq("id"), order = Seq("version"), committer = c)
    intercept[IllegalArgumentException] {
      Upsert.appendTableAtomic(spark, Seq(("d1", 2L, 1L)).toDF("day", "id", "version"), pPath, c)
    }
  }
}
