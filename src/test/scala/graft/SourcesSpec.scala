package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format breadth: the engine's tables round-trip through
  * csv/json/orc with explicit schemas (never inferred — SURVEY.md §1.2).
  * JDBC (the reference's actual OLTP source, S1) uses the same
  * `spark.read.format("jdbc").option("query", …)` surface; no database
  * ships in this container, so it is exercised only by shape.
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
}
