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
}
