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

  test("CATALOG() resolves names to pinned versions, AT-version time-travels, SHOW CATALOG lists pins") {
    val root = Files.createTempDirectory("graft-lsql-cat").toString
    val (cat, tblPath) = (s"$root/cat", s"$root/t")
    val cc = new VersionedCommitter
    val tc = new VersionedCommitter
    def upsert(t: (String, Long, Long)*): Long = {
      Upsert.upsertPartitionsAtomic(spark, t.toDF("day", "id", "version"),
        tblPath, "day", keys = Seq("id"), order = Seq("version"), committer = tc)
      tc.versions(tblPath).last
    }
    val v1 = upsert(("d1", 1L, 100L), ("d2", 2L, 100L))
    val catV1 = graft.pipeline.Catalog.register(cat, "users", tblPath, v1, cc, tc)
    val v2 = upsert(("d1", 1L, 101L), ("d1", 3L, 100L))
    graft.pipeline.Catalog.register(cat, "users", tblPath, v2, cc, tc)

    // current pins: the name reads table-v2
    assert(spark.sql(s"SELECT id, version FROM CATALOG('$cat', 'users')")
      .as[(Long, Long)].collect().toSet ==
      Set((1L, 101L), (2L, 100L), (3L, 100L)))
    // cross-table time travel: pins as of the FIRST catalog version
    assert(spark.sql(
        s"SELECT id, version FROM CATALOG('$cat', 'users', $catV1)")
      .as[(Long, Long)].collect().toSet ==
      Set((1L, 100L), (2L, 100L)))
    // unknown names refuse loudly, listing what exists
    val err = intercept[IllegalArgumentException] {
      spark.sql(s"SELECT * FROM CATALOG('$cat', 'nope')")
    }
    assert(err.getMessage.contains("users"))
    // SHOW CATALOG lists the committed pins
    val pins = spark.sql(s"SHOW CATALOG '$cat'")
      .as[(String, String, Long)].collect().toSeq
    assert(pins == Seq(("users", tblPath, v2)))
    // composes with ordinary SQL (join against a path read)
    val joined = spark.sql(
      s"SELECT a.id FROM CATALOG('$cat', 'users') a " +
        s"JOIN '$tblPath' b ON a.id = b.id WHERE a.version = 100")
    assert(joined.as[Long].collect().sorted.toSeq == Seq(2L, 3L))
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

  private def tableRows(path: String, c: VersionedCommitter): Set[(String, Long, Long)] =
    Upsert.readTable(spark, path, c).selectExpr("day", "id", "version")
      .as[(String, Long, Long)].collect().toSet

  test("DELETE FROM ... WHERE ≡ the API twin, NULL predicate rows kept") {
    val (pSql, cSql) = freshTable()
    val (pApi, cApi) = freshTable()
    val got = spark.sql(s"DELETE FROM '$pSql' WHERE version = 100")
      .as[(String, Long)].head()
    val st = Upsert.deleteWhere(spark, pApi, "day",
      org.apache.spark.sql.functions.expr("version = 100"), cApi)
    assert(got == ((st.touchedPartitions.mkString(","), st.deletedRows)))
    assert(tableRows(pSql, cSql) == tableRows(pApi, cApi))
    assert(tableRows(pSql, cSql) == Set(("d1", 1L, 101L)))
    // the SQL-driven commit carries the same history label as the API's
    assert(spark.sql(s"DESCRIBE HISTORY '$pSql'")
      .select("operation").as[String].collect().contains("delete_where"))
  }

  test("UPDATE ... SET ... WHERE ≡ the API twin, pre-update row visible to SET") {
    val (pSql, cSql) = freshTable()
    val (pApi, cApi) = freshTable()
    val got = spark.sql(
        s"UPDATE '$pSql' SET version = version + 1000 WHERE id = 2")
      .as[(String, Long)].head()
    val st = Upsert.updateWhere(spark, pApi, "day",
      org.apache.spark.sql.functions.expr("id = 2"),
      Map("version" -> org.apache.spark.sql.functions.expr("version + 1000")), cApi)
    assert(got == ((st.touchedPartitions.mkString(","), st.updatedRows)))
    assert(tableRows(pSql, cSql) == tableRows(pApi, cApi))
    assert(tableRows(pSql, cSql).contains(("d2", 2L, 1100L)))
  }

  test("MERGE INTO with all three clauses ≡ the API twin") {
    val (pSql, cSql) = freshTable() // rows: (d1,1,101), (d2,2,100)
    val (pApi, cApi) = freshTable()
    val source = Seq(("d1", 1L, 500L), ("d2", 2L, 500L), ("d1", 9L, 500L))
      .toDF("day", "id", "version")
    source.createOrReplaceTempView("merge_src")
    val got = spark.sql(
      s"""MERGE INTO '$pSql' USING merge_src ON KEYS (day, id)
         |  WHEN MATCHED AND id = 2 THEN DELETE
         |  WHEN MATCHED AND id = 1 THEN UPDATE SET version = __src_version
         |  WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      .as[(String, Long, Long, Long)].head()
    val st = Upsert.mergeInto(spark, pApi, "day", Seq("day", "id"), source,
      deleteCond = Some(org.apache.spark.sql.functions.expr("id = 2")),
      updateCond = Some(org.apache.spark.sql.functions.expr("id = 1")),
      set = Map("version" -> org.apache.spark.sql.functions.expr("__src_version")),
      committer = cApi)
    assert(got == ((st.touchedPartitions.mkString(","), st.updatedRows,
      st.deletedRows, st.insertedRows)))
    assert(tableRows(pSql, cSql) == tableRows(pApi, cApi))
    assert(tableRows(pSql, cSql) ==
      Set(("d1", 1L, 500L), ("d1", 9L, 500L)))
    // parenthesized SELECT works as the source too (insert-only merge)
    spark.sql(s"""MERGE INTO '$pSql' USING
      |(SELECT 'd2' AS day, CAST(7 AS BIGINT) AS id, CAST(1 AS BIGINT) AS version)
      |ON KEYS (day, id) WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(tableRows(pSql, cSql).contains(("d2", 7L, 1L)))
  }

  test("OPTIMIZE [ZORDER BY] compacts through SQL with the honest stats row") {
    val (path, c) = freshTable()
    // pending MoR delta gives the compaction real work (an already-tight
    // layout is a legitimate no-op that commits nothing)
    Upsert.upsertKeysMor(spark, path, "day", Seq("id"), Seq("version"),
      Seq(("d1", 5L, 100L)).toDF("day", "id", "version"), c)
    val row = spark.sql(s"OPTIMIZE '$path' ZORDER BY (id)")
      .as[(String, Long, Long, Long)].head()
    assert(row._2 >= row._3 && row._4 >= 0L, s"compaction stats: $row")
    assert(tableRows(path, c) ==
      Set(("d1", 1L, 101L), ("d1", 5L, 100L), ("d2", 2L, 100L)),
      "OPTIMIZE must materialize the pending delta, never change the answer")
    assert(!c.readManifest(path).keys.exists(_.startsWith("__delta.")),
      "compaction must fold the sidecar in")
    assert(spark.sql(s"DESCRIBE HISTORY '$path'")
      .select("operation").as[String].collect().contains("compact"))
  }

  test("CASE WHEN and subquery WHERE pass through the DML grammar intact") {
    val (path, c) = freshTable() // (d1,1,101), (d2,2,100)
    // CASE WHEN inside a MERGE SET expression must not be mis-read as a
    // clause boundary
    Seq(("d1", 1L, 7L), ("d2", 2L, 7L)).toDF("day", "id", "version")
      .createOrReplaceTempView("case_src")
    spark.sql(
      s"""MERGE INTO '$path' USING case_src ON KEYS (day, id)
         |  WHEN MATCHED THEN UPDATE SET version = CASE WHEN id = 1 THEN 111 ELSE version END""".stripMargin)
    assert(tableRows(path, c) == Set(("d1", 1L, 111L), ("d2", 2L, 100L)))
    // a subquery's own WHERE inside an UPDATE assignment must not
    // truncate the SET list (the statement's WHERE is the TOP-LEVEL one)
    spark.sql(s"UPDATE '$path' SET version = " +
      "(SELECT 500 WHERE 1 = 1) WHERE id = 2")
    assert(tableRows(path, c).contains(("d2", 2L, 500L)))
  }

  test("duplicate MERGE clauses refuse loudly instead of last-clause-wins") {
    val e = intercept[IllegalArgumentException] {
      spark.sql("MERGE INTO '/tmp/x' USING v ON KEYS (id) " +
        "WHEN MATCHED AND a = 1 THEN UPDATE SET x = 1 " +
        "WHEN MATCHED AND a = 2 THEN UPDATE SET x = 2")
    }
    assert(e.getMessage.contains("duplicate MERGE UPDATE"))
    val e2 = intercept[IllegalArgumentException] {
      spark.sql("MERGE INTO '/tmp/x' USING v ON KEYS (id) " +
        "WHEN MATCHED AND a = 1 THEN DELETE WHEN MATCHED THEN DELETE")
    }
    assert(e2.getMessage.contains("duplicate MERGE DELETE"))
  }

  test("DML near-misses error loudly with the expected grammar, not a Spark parse error") {
    val e1 = intercept[IllegalArgumentException] {
      spark.sql("DELETE FROM '/tmp/x'") // missing WHERE
    }
    assert(e1.getMessage.contains("DELETE FROM '<path>' WHERE"))
    val e2 = intercept[IllegalArgumentException] {
      spark.sql("MERGE INTO '/tmp/x' USING v ON KEYS (id) WHEN MATCHED THEN UPSERT")
    }
    assert(e2.getMessage.contains("malformed"))
    val e3 = intercept[IllegalArgumentException] {
      spark.sql("OPTIMIZE '/tmp/x' SORT BY (id)")
    }
    assert(e3.getMessage.contains("OPTIMIZE"))
    // unquoted targets are NOT ours: Spark's own error surfaces
    val e4 = intercept[Exception] { spark.sql("DELETE FROM sometable") }
    assert(!String.valueOf(e4.getMessage).contains("malformed graft"))
  }

  test("INSERT INTO appends atomically; partitioned targets refuse") {
    val path = Files.createTempDirectory("graft-lsql").toString + "/log"
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").createOrReplaceTempView("ins_a")
    Seq((3L, "c")).toDF("id", "s").createOrReplaceTempView("ins_b")
    val n1 = spark.sql(s"INSERT INTO '$path' SELECT * FROM ins_a")
      .as[Long].head()
    val n2 = spark.sql(s"INSERT INTO '$path' SELECT * FROM ins_b")
      .as[Long].head()
    assert((n1, n2) == ((2L, 1L)), "inserted_rows is metadata-proved")
    // the read surface composes: SELECT over the just-appended path
    assert(spark.sql(s"SELECT id FROM '$path' ORDER BY id")
      .as[Long].collect().toSeq == Seq(1L, 2L, 3L))
    // a keyed partition-managed table refuses a blind multiset append
    val (pt, _) = freshTable()
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO '$pt' SELECT * FROM ins_a")
    }
    assert(String.valueOf(e.getMessage).contains("append"))
  }

  test("CTAS creates, refuses an existing table, and OR REPLACE overwrites") {
    val path = Files.createTempDirectory("graft-lsql").toString + "/ctas"
    Seq((1L, "d1"), (2L, "d1"), (3L, "d2")).toDF("id", "day")
      .createOrReplaceTempView("ctas_src")
    val st = spark.sql(s"CREATE TABLE '$path' PARTITIONED BY (day) " +
      "AS SELECT * FROM ctas_src").as[(Long, Long)].head()
    assert(st == ((3L, 2L)), "rows_written × n_partitions from the result")
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"CREATE TABLE '$path' AS SELECT * FROM ctas_src")
    }
    assert(e.getMessage.contains("CREATE OR REPLACE"))
    // OR REPLACE commits a new version; the old one stays time-travelable
    spark.sql(s"CREATE OR REPLACE TABLE '$path' PARTITIONED BY (day) " +
      "AS SELECT id + 10 AS id, day FROM ctas_src WHERE day = 'd1'")
    assert(spark.sql(s"SELECT id FROM '$path' ORDER BY id")
      .as[Long].collect().toSeq == Seq(11L, 12L))
    assert(spark.sql(s"SELECT id FROM '$path' VERSION AS OF 1 ORDER BY id")
      .as[Long].collect().toSeq == Seq(1L, 2L, 3L))
    // unpartitioned CTAS is one atomic snapshot
    val p2 = Files.createTempDirectory("graft-lsql").toString + "/snap"
    assert(spark.sql(s"CREATE TABLE '$p2' AS SELECT * FROM ctas_src")
      .as[(Long, Long)].head() == ((3L, 1L)))
    assert(spark.sql(s"SELECT count(*) AS n FROM '$p2'").as[Long].head() == 3L)
  }

  test("ALTER TABLE renames/drops columns and manages CHECKs via SQL") {
    val (path, c) = freshTable()
    val r = spark.sql(s"ALTER TABLE '$path' RENAME COLUMN version TO rev")
      .as[(String, String, Long)].head()
    assert(r._1 == "rename_column" && r._2 == "version -> rev")
    assert(spark.sql(s"SELECT id, rev FROM '$path' ORDER BY id")
      .as[(Long, Long)].collect().toSeq == Seq((1L, 101L), (2L, 100L)))
    // ADD CONSTRAINT validates existing rows, then gates writes
    spark.sql(s"ALTER TABLE '$path' ADD CONSTRAINT pos CHECK (rev > 0)")
    val e = intercept[Exception] {
      Upsert.upsertPartitionsAtomic(spark,
        Seq(("d1", 9L, -5L)).toDF("day", "id", "rev"),
        path, "day", keys = Seq("id"), order = Seq("rev"), committer = c)
    }
    assert(String.valueOf(e.getMessage).contains("pos"))
    spark.sql(s"ALTER TABLE '$path' DROP CONSTRAINT pos")
    Upsert.upsertPartitionsAtomic(spark,
      Seq(("d1", 9L, -5L)).toDF("day", "id", "rev"),
      path, "day", keys = Seq("id"), order = Seq("rev"), committer = c)
    // DROP COLUMN is metadata-only; the current read stops binding it
    spark.sql(s"ALTER TABLE '$path' DROP COLUMN rev")
    assert(!spark.sql(s"SELECT * FROM '$path'").columns.contains("rev"))
    // a violating ADD CONSTRAINT refuses (id 9 exists now)
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE '$path' ADD CONSTRAINT small CHECK (id < 9)")
    }
    assert(String.valueOf(e2.getMessage).contains("small"))
  }

  test("SELECT over a quoted path reads the table, pinned or current") {
    val (path, c) = freshTable()
    // current state: keep-latest per key → (1,101),(2,100)
    assert(spark.sql(s"SELECT id, version FROM '$path' ORDER BY id")
      .as[(Long, Long)].collect().toSeq == Seq((1L, 101L), (2L, 100L)))
    // VERSION AS OF pins the first commit
    assert(spark
      .sql(s"SELECT id, version FROM '$path' VERSION AS OF 1 ORDER BY id")
      .as[(Long, Long)].collect().toSeq == Seq((1L, 100L), (2L, 100L)))
    // TIMESTAMP AS OF resolves by commit wall-clock
    val ts1 = c.commitTimestamps(path)(1L)
    assert(spark
      .sql(s"SELECT id, version FROM '$path' TIMESTAMP AS OF $ts1 ORDER BY id")
      .as[(Long, Long)].collect().toSeq == Seq((1L, 100L), (2L, 100L)))
    // an un-pinned reference tracks new commits: the view re-registers
    // on every parse, so the same statement sees the new row
    Upsert.upsertPartitionsAtomic(spark,
      Seq(("d2", 3L, 300L)).toDF("day", "id", "version"),
      path, "day", keys = Seq("id"), order = Seq("version"), committer = c)
    assert(spark.sql(s"SELECT count(*) AS n FROM '$path'")
      .as[Long].head() == 3L)
  }

  test("SHOW PARTITIONS / SHOW CONSTRAINTS are metadata-only reads") {
    val (path, _) = freshTable()
    assert(spark.sql(s"SHOW PARTITIONS '$path'")
      .as[(String, Long)].collect().toSeq == Seq(("d1", 1L), ("d2", 1L)))
    spark.sql(s"ALTER TABLE '$path' ADD CONSTRAINT pos CHECK (version > 0)")
    assert(spark.sql(s"SHOW CONSTRAINTS '$path'")
      .as[(String, String)].collect().toSeq == Seq(("pos", "version > 0")))
  }

  test("SHOW PARTITIONS scopes the MoR -1 per partition and rejects non-partitioned tables") {
    val (path, c) = freshTable()
    // MoR-delete only d1: its count is pending, d2's footer stamp survives
    Upsert.deleteKeysMor(spark, path, "day", keys = Seq("id"),
      keyRows = Seq((1L, "d1")).toDF("id", "day"), committer = c)
    assert(spark.sql(s"SHOW PARTITIONS '$path'")
      .as[(String, Long)].collect().toMap == Map("d1" -> -1L, "d2" -> 1L))
    // a snapshot table has data entries ('all') but no partition column —
    // SHOW PARTITIONS must refuse loudly, not list storage layout
    val snap = Files.createTempDirectory("graft-lsql").toString + "/s"
    Upsert.writeTableAtomic(spark,
      Seq((1L, "x")).toDF("id", "v"), snap, new VersionedCommitter)
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"SHOW PARTITIONS '$snap'").collect()
    }
    assert(e.getMessage.contains("not a partitioned"))
  }

  test("CREATE OR REPLACE drops stale partitions with escaped values and layout entries") {
    val dir = Files.createTempDirectory("graft-lsql").toString
    // partition values that Hive-escape ('a b' -> 'a%20b'): the manifest
    // KEY differs from the raw value, so the replace list must unescape
    // old keys or the drop misses them and the stale partition survives
    val p1 = s"$dir/esc"
    Seq(("a b", 1L), ("c", 2L)).toDF("day", "id")
      .createOrReplaceTempView("cor_src1")
    spark.sql(s"CREATE TABLE '$p1' PARTITIONED BY (day) AS SELECT * FROM cor_src1")
    Seq(("c", 3L)).toDF("day", "id").createOrReplaceTempView("cor_src2")
    spark.sql(s"CREATE OR REPLACE TABLE '$p1' PARTITIONED BY (day) " +
      "AS SELECT * FROM cor_src2")
    assert(spark.sql(s"SELECT day, id FROM '$p1'")
      .as[(String, Long)].collect().toSeq == Seq(("c", 3L)),
      "the escaped-value partition must not survive the replace")
    // a snapshot table's 'all' layout entry is dropped by the replace even
    // when a NEW partition value is literally the string 'all' (same
    // schema across the replace — the add-only evolution gate is its own
    // contract, not under test here)
    val p2 = s"$dir/snap"
    val c2 = new VersionedCommitter
    Upsert.writeTableAtomic(spark,
      Seq(("x", 1L)).toDF("bucket", "id"), p2, c2)
    Seq(("all", 10L), ("some", 11L)).toDF("bucket", "id")
      .createOrReplaceTempView("cor_src3")
    spark.sql(s"CREATE OR REPLACE TABLE '$p2' PARTITIONED BY (bucket) " +
      "AS SELECT * FROM cor_src3")
    assert(spark.sql(s"SELECT bucket, id FROM '$p2'")
      .as[(String, Long)].collect().toSet == Set(("all", 10L), ("some", 11L)))
    assert(spark.sql(s"SHOW PARTITIONS '$p2'")
      .as[(String, Long)].collect().toMap == Map("all" -> 1L, "some" -> 1L))
  }

  test("function-argument FROM and non-path literals survive the read rewriter") {
    // SQL-standard trim puts a plain literal right after FROM — the
    // rewriter must not read 'xxabcx' as a table path
    assert(spark.sql("SELECT trim(BOTH 'x' FROM 'xxabcx') AS t")
      .as[String].head() == "abc")
    assert(spark.sql("SELECT substring('abcdef' FROM 2 FOR 3) AS s")
      .as[String].head() == "bcd")
    // …including when a real path read sits in the same statement
    val (path, _) = freshTable()
    assert(spark.sql(
      s"SELECT trim(BOTH 'x' FROM 'xxabcx') AS t, count(*) AS n FROM '$path'")
      .as[(String, Long)].head() == ("abc", 2L))
  }

  test("TIMESTAMP AS OF accepts quoted timestamps and rejects junk loudly") {
    val (path, c) = freshTable()
    val ts1 = c.commitTimestamps(path)(1L)
    val iso = java.time.Instant.ofEpochMilli(ts1).toString // v1-inclusive pin
    assert(spark.sql(
      s"SELECT id, version FROM '$path' TIMESTAMP AS OF '$iso' ORDER BY id")
      .as[(Long, Long)].collect().toSeq == Seq((1L, 100L), (2L, 100L)))
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"SELECT * FROM '$path' TIMESTAMP AS OF 'not-a-time'").collect()
    }
    assert(e.getMessage.contains("supported pin"))
  }

  test("CHANGES() exposes the change feed as a SQL relation") {
    val (path, c) = freshTable() // v1: (1,100),(2,100); v2: (1,101)
    // explicit keys ≡ the API feed
    val sql = spark.sql(s"SELECT * FROM CHANGES('$path', 1, 2, 'id')")
      .selectExpr("id", "version", "change_type")
      .as[(Long, Long, String)].collect().toSet
    val api = Upsert.tableChanges(spark, path, 1L, 2L, Seq("id"), c)
      .selectExpr("id", "version", "change_type")
      .as[(Long, Long, String)].collect().toSet
    assert(sql == api && sql == Set((1L, 101L, "update_post")))
    // a CDF-declared table resolves keys implicitly
    Upsert.enableChangeFeed(path, Seq("id"), c) // v3 (metadata-only)
    Upsert.upsertPartitionsAtomic(spark,
      Seq(("d2", 5L, 500L)).toDF("day", "id", "version"),
      path, "day", keys = Seq("id"), order = Seq("version"), committer = c)
    assert(spark.sql(s"SELECT id FROM CHANGES('$path', 3, 4)")
      .as[Long].collect().toSeq == Seq(5L))
    // absent both declarations, the error says what to provide
    val p2 = Files.createTempDirectory("graft-lsql").toString + "/nofeed"
    Seq((1L, "x")).toDF("id", "s").createOrReplaceTempView("chg_src")
    spark.sql(s"INSERT INTO '$p2' SELECT * FROM chg_src")
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"SELECT * FROM CHANGES('$p2', 0, 1)")
    }
    assert(e.getMessage.contains("key columns"))
  }

  test("quoted-path JOIN, subqueries, and string literals survive the rewrite") {
    val (path, _) = freshTable()
    // path refs after FROM and JOIN, at nested depth, in one statement
    val n = spark.sql(
      s"SELECT count(*) AS n FROM '$path' a JOIN '$path' b ON a.id = b.id " +
        s"WHERE a.id IN (SELECT id FROM '$path' VERSION AS OF 1)")
      .as[Long].head()
    assert(n == 2L)
    // a literal containing FROM '<path>' must NOT be rewritten
    val s = spark.sql(
      s"SELECT 'reads FROM ''/nope'' happily' AS s FROM '$path' LIMIT 1")
      .as[String].head()
    assert(s == "reads FROM '/nope' happily")
    // ordinary SQL with no quoted path is untouched (delegates verbatim)
    assert(spark.sql("SELECT 'from' AS w").as[String].head() == "from")
    // comments never trigger a rewrite — a commented-out path to a
    // nonexistent table must not be resolved (it would fail the read)
    assert(spark.sql(
      s"SELECT id -- was: FROM '/nonexistent'\nFROM '$path' LIMIT 1")
      .as[Long].count() == 1L)
    assert(spark.sql(
      s"SELECT id /* FROM '/nonexistent' */ FROM '$path' LIMIT 1")
      .as[Long].count() == 1L)
  }
}
