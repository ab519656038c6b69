package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Extract

/** GUARDED live-Postgres round trip for the S1 extract — the one caveat
  * left on the dialect fragment: the `jdbc:graftpg:` wire stand-in
  * (`PgWireStandIn`) proves the pushed SQL and partition ranges EXECUTE,
  * but a real server's own parser/types stay untested in this sandbox
  * (no Postgres, no egress). Wherever a server IS reachable, set
  *
  *   SPARK_GRAFT_PG_URL=jdbc:postgresql://host:5432/db
  *   SPARK_GRAFT_PG_USER / SPARK_GRAFT_PG_PASSWORD (optional)
  *
  * and this spec runs `Extract.jdbcWindowed` with `Dialect.postgres`
  * end-to-end against it: creates a throwaway table, extracts a window
  * partitioned 4 ways, and checks both the row set and the window
  * boundary. Without the env var the test is reported CANCELED (visible
  * in the run log as "!!! CANCELED !!!"), never silently passed.
  */
class LivePostgresSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("jdbcWindowed with Dialect.postgres round-trips against a live server (env-gated)") {
    val url = sys.env.get("SPARK_GRAFT_PG_URL")
    assume(url.isDefined,
      "SPARK_GRAFT_PG_URL not set — no live Postgres reachable; " +
        "the dialect remains covered by the PgWireStandIn statement-log spec")
    val user = sys.env.getOrElse("SPARK_GRAFT_PG_USER", "postgres")
    val password = sys.env.getOrElse("SPARK_GRAFT_PG_PASSWORD", "")

    val table = s"graft_extract_probe_${System.currentTimeMillis()}"
    val conn = java.sql.DriverManager.getConnection(url.get, user, password)
    try {
      val st = conn.createStatement()
      st.execute(s"CREATE TABLE $table (id BIGINT PRIMARY KEY, " +
        "effective_ts TIMESTAMP NOT NULL, v TEXT)")
      // 10 rows, one per minute from epoch 1700000000; the window below
      // keeps minutes 2..7 (6 rows) — boundary semantics: >= lo, < hi
      (0 until 10).foreach { i =>
        st.execute(s"INSERT INTO $table VALUES ($i, " +
          s"to_timestamp(${1700000000L + i * 60}), 'r$i')")
      }
      val lo = 1700000000L + 2 * 60
      val hi = 1700000000L + 8 * 60
      val df = Extract.jdbcWindowed(spark, url.get, table, "effective_ts",
        lo, hi, user, password, numPartitions = 4,
        dialect = Extract.Dialect.postgres)
      val ids = df.select("id").collect().map(_.getLong(0)).toSet
      assert(ids == (2L to 7L).toSet,
        s"window [$lo,$hi) must keep exactly minutes 2..7, got $ids")
      assert(df.rdd.getNumPartitions == 4,
        "the extract must parallelize over the requested partition count")
    } finally {
      try conn.createStatement().execute(s"DROP TABLE IF EXISTS $table")
      finally conn.close()
    }
  }
}
