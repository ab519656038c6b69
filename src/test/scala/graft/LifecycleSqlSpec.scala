package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Upsert
import graft.streaming.VersionedCommitter

/** The injected lifecycle SQL surface: DESCRIBE HISTORY / RESTORE /
  * VACUUM / CLONE / ANALYZE parse to commands and run against
  * path-addressed manifest tables; everything else delegates to Spark's
  * parser verbatim.
  */
class LifecycleSqlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): (String, VersionedCommitter) = {
    val path = Files.createTempDirectory("graft-lsql").toString + "/t"
    val c = new VersionedCommitter
    def upsert(t: (String, Long, Long)*): Unit =
      Upsert.upsertPartitionsAtomic(spark,
        t.map { case (d, i, v) => (d, i, v) }.toDF("day", "id", "version"),
        path, "day", keys = Seq("id"), order = Seq("version"), committer = c)
    upsert(("d1", 1L, 100L), ("d2", 2L, 100L)) // v1
    upsert(("d1", 1L, 101L))                   // v2
    (path, c)
  }

  test("DESCRIBE HISTORY / ANALYZE / RESTORE / VACUUM round-trip through spark.sql") {
    val (path, c) = freshTable()
    val h = spark.sql(s"DESCRIBE HISTORY '$path'")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(h.toSeq == Seq((1L, "upsert", 2L, 2L), (2L, "upsert", 2L, 2L)))

    val stats = spark.sql(s"ANALYZE TABLE '$path' COMPUTE STATISTICS") // v3
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(stats("id") == ("id", 2L, 0L, 2L, "1", "2"))

    spark.sql(s"RESTORE TABLE '$path' TO VERSION 1") // v4
    assert(Upsert.readTable(spark, path, c)
      .selectExpr("id", "version").as[(Long, Long)].collect().toSet ==
      Set((1L, 100L), (2L, 100L)))
    // history now carries the SQL-driven labels
    assert(spark.sql(s"DESCRIBE HISTORY '$path'")
      .select("operation").as[String].collect().sorted.toSeq ==
      Seq("analyze", "restore(v1)", "upsert", "upsert"))

    val expired = spark.sql(s"VACUUM '$path' KEEP 1")
      .as[Long].collect().sorted.toSeq
    assert(expired == Seq(1L, 2L, 3L))
    assert(c.versions(path) == Seq(4L))
  }

  test("DESCRIBE DETAIL summarizes version/layout/rows; MoR suppresses the count") {
    val (path, c) = freshTable()
    val d = spark.sql(s"DESCRIBE DETAIL '$path'")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(d._1 == 2L && d._2 == 2L, s"version 2, 2 partitions: $d")
    assert(d._3 >= 2L && d._4 > 0L, s"files and bytes must be positive: $d")
    assert(d._5 == 2L, s"__rows stamps prove the exact count: $d")
    // pending MoR sidecars change the PRESENTED count → -1, never a lie
    Upsert.deleteKeysMor(spark, path, "day", keys = Seq("id"),
      keyRows = Seq((1L, "d1")).toDF("id", "day"), committer = c)
    val d2 = spark.sql(s"DESCRIBE DETAIL '$path'")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(d2._5 == -1L, s"pending sidecars must suppress the count: $d2")
  }

  test("ANALYZE ... INCREMENTAL FOR COLUMNS runs the per-partition path via SQL") {
    val (path, c) = freshTable()
    val stats = spark.sql(
        s"ANALYZE TABLE '$path' COMPUTE STATISTICS INCREMENTAL FOR COLUMNS id, version")
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(stats("id") == ("id", 2L, 0L, 2L, "1", "2"))
    assert(stats("version") == ("version", 2L, 0L, 2L, "100", "101"))
    // the per-partition sketch sidecar landed and a re-run merges only
    assert(c.readManifest(path).contains("__pstats"))
    val again = Upsert.analyzeTableIncremental(spark, path, c,
      Seq("id", "version"))
    assert(again.recomputedPartitions.isEmpty,
      "the SQL run must have left fresh per-partition stamps")
  }

  test("CLONE ... TO ... AT VERSION creates a zero-copy branch via SQL") {
    val (path, _) = freshTable()
    val dst = Files.createTempDirectory("graft-lsql").toString + "/clone"
    val row = spark.sql(s"CLONE '$path' TO '$dst' AT VERSION 1")
      .as[(Long, Long, Long)].head()
    assert(row == ((1L, 2L, 0L)))
    assert(Upsert.readTable(spark, dst)
      .selectExpr("id", "version").as[(Long, Long)].collect().toSet ==
      Set((1L, 100L), (2L, 100L)))
  }

  test("non-lifecycle SQL delegates to Spark's parser untouched") {
    assert(spark.sql("SELECT 1 + 1 AS x").as[Int].head() == 2)
    // a statement that LOOKS close but isn't ours still reaches Spark and
    // fails with Spark's own parse error, not a graft one
    val e = intercept[Exception] { spark.sql("DESCRIBE HISTORY unquoted") }
    assert(e.getMessage != null)
  }
}
