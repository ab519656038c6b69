package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Maintenance, Upsert}
import graft.streaming.{TableFs, VersionedCommitter}

/** The Hadoop-FileSystem storage seam ([[graft.streaming.TableFs]]): the
  * whole manifest/committer stack addressed through an explicit `file:` URI
  * — i.e. resolved by Hadoop's LocalFileSystem, not java.io — runs a full
  * versioned-upsert + time-travel + expiry/GC cycle. This is the
  * portability proof for the lakehouse layer: every metadata/staging I/O
  * goes through the same API that binds to HDFS or an object-store
  * connector on a real cluster.
  */
class TableFsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Long)] =
    df.selectExpr("day", "id", "version")
      .as[(String, Long, Long)].collect().toSet

  test("versioned upsert + time travel + expiry GC through a file: URI") {
    val local = Files.createTempDirectory("graft-hfs").toString
    val path = s"file:$local/t"
    val c = new VersionedCommitter
    def upsert(t: (String, Long, Long)*): Unit =
      Upsert.upsertPartitionsAtomic(spark,
        t.toSeq.toDF("day", "id", "version"),
        path, "day", keys = Seq("id"), order = Seq("version"), committer = c)

    upsert(("d1", 1L, 100L), ("d2", 2L, 100L)) // v1
    upsert(("d1", 1L, 101L))                   // v2 — v1's d1 dir now historical
    upsert(("d1", 1L, 102L))                   // v3

    // current read + manifest through the URI
    assert(rows(Upsert.readTable(spark, path, c)) ==
      Set(("d1", 1L, 102L), ("d2", 2L, 100L)))
    assert(TableFs.exists(s"$path/MANIFEST"),
      "the manifest must live under the URI path")
    assert(c.versions(path) == Seq(1L, 2L, 3L))

    // time travel resolves historical versions from the URI store
    assert(rows(Upsert.readTableAsOf(spark, path, 1L, c)) ==
      Set(("d1", 1L, 100L), ("d2", 2L, 100L)))

    // expiry + GC: the expired versions' exclusive staging dirs are
    // released by the same TableFs walk
    val expired = Maintenance.expireVersions(path, keepLast = 1, c)
    assert(expired == Seq(1L, 2L))
    intercept[IllegalArgumentException] {
      Upsert.readTableAsOf(spark, path, 1L, c)
    }
    assert(rows(Upsert.readTable(spark, path, c)) ==
      Set(("d1", 1L, 102L), ("d2", 2L, 100L)))
    val liveRels = c.readManifest(path).values.toSet
    val batchDirs = TableFs.list(path)
      .filter(f => f.isDirectory && f.getPath.getName.startsWith("batch-"))
      .map(_.getPath.getName)
    assert(batchDirs.nonEmpty &&
      batchDirs.forall(b => liveRels.exists(_.startsWith(s"$b/"))),
      s"only manifest-referenced staging dirs may survive expiry: " +
        s"${batchDirs.mkString(",")} vs $liveRels")
  }

  test("SQL lifecycle statements address the file: URI table") {
    val local = Files.createTempDirectory("graft-hfs").toString
    val path = s"file:$local/t"
    val c = new VersionedCommitter
    Upsert.upsertPartitionsAtomic(spark,
      Seq(("d1", 1L, 100L), ("d2", 2L, 100L)).toDF("day", "id", "version"),
      path, "day", keys = Seq("id"), order = Seq("version"), committer = c)
    assert(spark.sql(s"SELECT count(*) AS n FROM '$path'")
      .as[Long].head() == 2L)
    assert(spark.sql(s"SHOW PARTITIONS '$path'")
      .as[(String, Long)].collect().toMap == Map("d1" -> 1L, "d2" -> 1L))
  }
}
