package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format breadth: the engine's tables round-trip through
  * csv/json/orc with explicit schemas (never inferred — SURVEY.md §1.2).
  * JDBC (the reference's actual OLTP source, S1) round-trips against an
  * embedded in-memory Derby with statement logging on, so the windowed
  * extract's pushdown is OBSERVED in the database's own log rather than
  * assumed from the subquery construction.
  */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val events =
    graft.sources.Tables.events(spark, "/root/testdata/sf0.001")

  private def roundTrip(fmt: String): Unit = {
    val dir = Files.createTempDirectory(s"graft-$fmt").toString
    // text formats need an explicit µs timestamp format — the default
    // pattern truncates to millis and silently loses precision
    val tsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    events.write.mode("overwrite").format(fmt)
      .option("timestampFormat", tsFmt).save(dir)
    val back = spark.read.format(fmt).schema(events.schema)
      .option("timestampFormat", tsFmt).load(dir)
    assert(back.schema == events.schema, s"$fmt schema drift")
    assert(back.count() == events.count())
    assert(back.exceptAll(events).count() == 0 && events.exceptAll(back).count() == 0,
      s"$fmt round-trip changed data")
  }

  test("csv round-trips with explicit schema")(roundTrip("csv"))
  test("json round-trips with explicit schema")(roundTrip("json"))
  test("orc round-trips with explicit schema")(roundTrip("orc"))

  test("xml round-trips with explicit schema") {
    // Spark 4 ships the XML data source in core; rowTag is mandatory
    val dir = Files.createTempDirectory("graft-xml").toString
    val tsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    events.write.mode("overwrite").format("xml")
      .option("rowTag", "event").option("timestampFormat", tsFmt).save(dir)
    val back = spark.read.format("xml").schema(events.schema)
      .option("rowTag", "event").option("timestampFormat", tsFmt).load(dir)
    assert(back.schema == events.schema, "xml schema drift")
    assert(back.count() == events.count())
    assert(back.exceptAll(events).count() == 0 && events.exceptAll(back).count() == 0,
      "xml round-trip changed data")
  }

  /** S1 closed end-to-end: a real JDBC database (embedded Derby — the one
    * JDBC engine shipping in /opt/spark/jars), the vitals-shaped DDL
    * (reference sql/postgres_ddl.sql:1-11), a 10-minute replication window
    * (reference scheduler/dataflow_flex_body.json:9), and pushdown observed
    * in Derby's statement log instead of asserted by construction.
    */
  test("jdbcWindowed round-trips through Derby with the window pruned database-side") {
    val home = Files.createTempDirectory("graft-derby")
    // statement logging must be configured before the Derby engine boots
    // (first connection in the JVM); the log lands in <derby.system.home>/derby.log
    System.setProperty("derby.system.home", home.toString)
    System.setProperty("derby.language.logStatementText", "true")
    val url = "jdbc:derby:memory:vitals;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      // vitals_events shape (reference sql/postgres_ddl.sql:1-11); Derby
      // has no UUID type — CHAR(36) carries the key
      st.execute("""CREATE TABLE vitals_events (
        event_id CHAR(36) PRIMARY KEY,
        patient_id VARCHAR(64) NOT NULL,
        loinc_code VARCHAR(16) NOT NULL,
        value_num DOUBLE,
        effective_ts TIMESTAMP NOT NULL)""")
      val zone = java.time.ZoneId.systemDefault()
      val loEpoch = java.time.LocalDateTime.of(2026, 1, 15, 10, 0, 0)
        .atZone(zone).toEpochSecond
      val hiEpoch = loEpoch + 600L // the reference's 10-minute window
      val ins = conn.prepareStatement(
        "INSERT INTO vitals_events VALUES (?, ?, ?, ?, ?)")
      // 20 rows inside the window, 10 before, 10 after
      val rows = (0 until 40).map { i =>
        val ts = loEpoch - 300L + i * 30L // 30s cadence straddling [lo, hi)
        (f"00000000-0000-0000-0000-${i}%012d", s"patient_${i % 7}",
          "8867-4", 60.0 + i, ts)
      }
      rows.foreach { case (id, patient, code, v, ts) =>
        ins.setString(1, id); ins.setString(2, patient); ins.setString(3, code)
        ins.setDouble(4, v)
        ins.setTimestamp(5, java.sql.Timestamp.from(
          java.time.Instant.ofEpochSecond(ts)))
        ins.executeUpdate()
      }
      val df = graft.sources.Extract.jdbcWindowed(spark, url, "vitals_events",
        "effective_ts", loEpoch, hiEpoch, "app", "app", numPartitions = 4,
        dialect = graft.sources.Extract.Dialect.derby(zone))
      // the read parallelizes into the requested partition count
      assert(df.rdd.getNumPartitions == 4)
      // Derby stores unquoted identifiers upper-case
      val got = df.collect().map(_.getAs[String]("EVENT_ID")).toSet
      val expected = rows.filter(r => r._5 >= loEpoch && r._5 < hiEpoch)
        .map(_._1).toSet
      assert(expected.size == 20 && got == expected,
        s"window must prune database-side: got ${got.size} of ${expected.size}")
      // no Spark-side Filter does that pruning — the window and the
      // partition ranges both live in the SQL shipped to the database
      val sparkFilters = df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FilterExec => f
      }
      assert(sparkFilters.isEmpty,
        s"window predicate must not be re-applied by Spark: $sparkFilters")
      // pushdown OBSERVED: Derby's own statement log shows the windowed
      // subquery and the per-partition range predicates it executed
      val log = Files.readString(home.resolve("derby.log"))
      assert(log.contains("WHERE effective_ts >= TIMESTAMP("),
        "window predicate must reach the database")
      // Spark quotes the partition column with the dialect's (upper-cased)
      // identifier: one range stride per partition, open-ended at the edges
      assert(log.contains("\"EXTRACT_EPOCH_S\" < ") &&
        log.contains("\"EXTRACT_EPOCH_S\" >= "),
        "partition range predicates must reach the database")
    } finally {
      conn.close()
      // drop the in-memory db so reruns in the same JVM start clean
      try java.sql.DriverManager.getConnection("jdbc:derby:memory:vitals;drop=true")
      catch { case _: java.sql.SQLException => () } // drop "fails" with 08006 by design
    }
  }

  /** S1's POSTGRES dialect executed, not just rendered: the same windowed
    * extract runs with `Dialect.postgres` against the registered
    * `jdbc:graftpg:` wire stand-in ([[PgWireStandIn]]) — Spark pushes the
    * Postgres-rendered subquery (EXTRACT(EPOCH FROM …), to_timestamp(…))
    * over a real JDBC connection; the stand-in records the received text
    * and executes it on embedded Derby after translating exactly those
    * two constructs. Closes the round-17 "fragment unit-rendered, never
    * executed" caveat down to "live Postgres server untested".
    */
  test("jdbcWindowed executes the Postgres dialect through the wire stand-in") {
    PgWireStandIn.register()
    PgWireStandIn.statements.clear()
    val url = "jdbc:graftpg:memory:pgvitals;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      conn.createStatement().execute("""CREATE TABLE vitals_events (
        event_id CHAR(36) PRIMARY KEY,
        patient_id VARCHAR(64) NOT NULL,
        loinc_code VARCHAR(16) NOT NULL,
        value_num DOUBLE,
        effective_ts TIMESTAMP NOT NULL)""")
      val zone = java.time.ZoneId.systemDefault()
      val loEpoch = java.time.LocalDateTime.of(2026, 2, 10, 9, 0, 0)
        .atZone(zone).toEpochSecond
      val hiEpoch = loEpoch + 600L
      val ins = conn.prepareStatement(
        "INSERT INTO vitals_events VALUES (?, ?, ?, ?, ?)")
      val rows = (0 until 40).map { i =>
        val ts = loEpoch - 300L + i * 30L
        (f"10000000-0000-0000-0000-${i}%012d", s"patient_${i % 7}",
          "8867-4", 60.0 + i, ts)
      }
      rows.foreach { case (id, patient, code, v, ts) =>
        ins.setString(1, id); ins.setString(2, patient); ins.setString(3, code)
        ins.setDouble(4, v)
        ins.setTimestamp(5, java.sql.Timestamp.from(
          java.time.Instant.ofEpochSecond(ts)))
        ins.executeUpdate()
      }
      val df = graft.sources.Extract.jdbcWindowed(spark, url, "vitals_events",
        "effective_ts", loEpoch, hiEpoch, "app", "app", numPartitions = 4,
        dialect = graft.sources.Extract.Dialect.postgres)
      assert(df.rdd.getNumPartitions == 4)
      val got = df.collect().map(_.getAs[String]("EVENT_ID")).toSet
      val expected = rows.filter(r => r._5 >= loEpoch && r._5 < hiEpoch)
        .map(_._1).toSet
      assert(expected.size == 20 && got == expected,
        s"window must prune database-side: got ${got.size} of ${expected.size}")
      // what crossed the wire WAS the Postgres dialect, and the window +
      // partition-range predicates arrived database-side
      import scala.jdk.CollectionConverters._
      val sent = PgWireStandIn.statements.asScala.toSeq
      assert(sent.exists(_.contains("EXTRACT(EPOCH FROM effective_ts)")),
        s"the Postgres epoch projection must cross the wire: $sent")
      assert(sent.exists(_.contains("WHERE effective_ts >= to_timestamp(")),
        s"the Postgres window predicate must cross the wire: $sent")
      assert(sent.exists(s => s.contains("\"EXTRACT_EPOCH_S\" >= ") ||
          s.contains("extract_epoch_s >= ")),
        s"partition range predicates must cross the wire: $sent")
    } finally {
      conn.close()
      try java.sql.DriverManager.getConnection("jdbc:derby:memory:pgvitals;drop=true")
      catch { case _: java.sql.SQLException => () }
    }
  }

  test("malformed JSON records quarantine instead of poisoning the batch") {
    val dir = Files.createTempDirectory("graft-badjson")
    java.nio.file.Files.writeString(dir.resolve("part-0.json"),
      """{"event_id": "a", "value": 1.5}
        |this is not json at all
        |{"event_id": "b", "value": "NOT_A_NUMBER"}
        |{"event_id": "c", "value": 3.0}
        |""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "event_id STRING, value DOUBLE, _corrupt_record STRING")
    // PERMISSIVE (the landing-zone default): parseable fields survive,
    // broken lines land whole in the quarantine column for repair
    val rows = spark.read.schema(schema).json(dir.toString)
      .collect().map(r => (r.getAs[String]("event_id"),
        Option(r.getAs[String]("_corrupt_record")).isDefined)).toSet
    assert(rows == Set(("a", false), ("c", false),
      (null, true),   // unparseable line: all fields null, raw line kept
      ("b", true)))   // type mismatch: parseable fields kept AND quarantined
    // FAILFAST: the same input is a hard error for pipelines that must halt
    val err = intercept[org.apache.spark.SparkException] {
      spark.read.schema("event_id STRING, value DOUBLE")
        .option("mode", "FAILFAST").json(dir.toString).collect()
    }
    // the malformed-record cause sits under the FAILED_READ_FILE wrapper
    val causes = Iterator.iterate[Throwable](err)(_.getCause)
      .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).toSeq
    assert(causes.exists(_.toLowerCase.contains("malformed")),
      s"expected a malformed-record failure, got: $causes")
  }

  // ---- sources.Formats: the staged interchange exports behind the
  // source_{csv,jsonl,orc}_* CORRECTNESS rows ----

  private lazy val expectedRollup = {
    import org.apache.spark.sql.functions._
    events.groupBy(to_date(col("ts")).as("date_id"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("sum_value_cents"))
  }

  test("Formats: csv/jsonl/orc daily rollups all equal the parquet rollup") {
    val dir = "/root/testdata/sf0.001"
    for (reader <- Seq(
        graft.sources.Formats.csvEvents _,
        graft.sources.Formats.jsonlEvents _,
        graft.sources.Formats.orcEvents _)) {
      val got = graft.sources.Formats.dailyRollup(reader(spark, dir))
      assert(got.exceptAll(expectedRollup).count() == 0 &&
        expectedRollup.exceptAll(got).count() == 0,
        "format round-trip bent the rollup")
    }
  }

  test("Formats: the orc scan pushes filters into the reader") {
    import org.apache.spark.sql.functions._
    // read PushedFilters off the scan node's metadata — the plan's
    // toString truncates long filter lists
    val scanPlan = graft.sources.Formats.orcEvents(spark, "/root/testdata/sf0.001")
      .filter(col("event_type") === "error" && col("value_cents") >= 1000L)
      .queryExecution.executedPlan
    val scan = TestSpark.fileScanNodes(scanPlan).headOption
      .getOrElse(fail("no file scan in the plan"))
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("EqualTo(event_type,error)"), pushed)
    assert(pushed.contains("GreaterThanOrEqual(value_cents,1000)"), pushed)
  }
}
