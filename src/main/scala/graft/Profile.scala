package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway per-query profiling harness (dev only). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.sources.Tables.NanosAsLongConf, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[profile] $name%-34s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warm
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    def ev = graft.sources.Tables.events(spark, dir)
    for (i <- 1 to 3) {
      time(s"scan-only #$i") { noop(ev.select("event_id", "props")) }
      time(s"get_json #$i") {
        noop(ev.select(expr("try_cast(get_json_object(props, '$.k') AS BIGINT)").as("s")))
      }
      time(s"from_json #$i") {
        noop(ev.select(expr("from_json(props, 'k BIGINT').k").as("s")))
      }
      time(s"regexp #$i") {
        noop(ev.select(expr("try_cast(regexp_extract(props, '\"k\"\\\\s*:\\\\s*(-?[0-9]+)', 1) AS BIGINT)").as("s")))
      }
      time(s"json+explode #$i") {
        noop(ev.select(explode(array_compact(array(
          expr("try_cast(get_json_object(props, '$.k') AS BIGINT)")))).as("s")))
      }
      time(s"ts-conv #$i") {
        noop(ev.select(unix_micros(col("ts")).as("us")))
      }
      time(s"variant #$i") {
        noop(ev.select(expr("try_variant_get(try_parse_json(props), '$.k', 'bigint')").as("s")))
      }
      time(s"mon_errors-now #$i") {
        noop(graft.operators.Monitoring.errors(ev))
      }
      time(s"errors-failonly #$i") {
        noop(ev.select(
          col("event_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("event_type").as("job_name"),
          explode(filter(array(expr("try_cast(get_json_object(props, '$.k') AS BIGINT)")),
            s => s.isNotNull && !s.between(50, 99))).as("status"))
          .orderBy(col("ts_us").desc, col("event_id").desc))
      }
      time(s"daily-now #$i") {
        noop(graft.operators.Monitoring.dailySummary(ev))
      }
    }
    spark.stop()
  }
}
