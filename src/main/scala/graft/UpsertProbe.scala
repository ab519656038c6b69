package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe behind the BASELINE.md "incremental upsert" row: measures
  * the partition-pruned upsert (`pipeline.Upsert`) against the full
  * overwrite snapshot it replaces, at a table size where the difference
  * is visible on local[32]. Run:
  * `sbt "runMain graft.UpsertProbe"` (UPSERT_PROBE_N rows, default 10M,
  * 30 day-partitions, 10k-row delta touching 2 days).
  */
object UpsertProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = sys.env.getOrElse("UPSERT_PROBE_N", "10000000").toLong
    val days = sys.env.getOrElse("UPSERT_PROBE_DAYS", "30").toInt
    val path = "/tmp/upsert_probe/t"
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[upsert-probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val base = spark.range(n)
      .select(
        concat(lit("d"), lpad((col("id") % days).cast("string"), 3, "0")).as("day"),
        col("id"), (col("id") * 7 % 1000).cast("double").as("value"),
        lit(1L).as("version"))
    time(s"full snapshot write ${n / 1000000}M") {
      base.write.mode(SaveMode.Overwrite).partitionBy("day").parquet(path)
    }
    // the reference's refresh model: EVERY cycle pays this again
    time(s"full snapshot REwrite ${n / 1000000}M") {
      spark.read.parquet(path).write.mode(SaveMode.Overwrite)
        .partitionBy("day").parquet(path + "_copy")
    }

    // 10k-row delta of key updates touching 2 of the `days` partitions
    // (keys chosen so key % days lands on day 3 or 17 — the same day the
    // base row lives in)
    val dayTarget = col("id") % 2 * 14 + 3
    // integer division (id div 2): `/` would be floating-point in Spark
    // SQL, sending odd-id keys to the wrong home day (half the delta
    // becoming inserts that duplicate keys in untouched partitions) and
    // coercing the id column to DOUBLE away from the LONG base schema
    val delta = spark.range(10000)
      .select(
        concat(lit("d"), lpad(dayTarget.cast("string"), 3, "0")).as("day"),
        (expr("id div 2") * days + dayTarget).cast("long").as("id"),
        lit(-1.0).as("value"), lit(2L).as("version"))
    time("partition-pruned upsert 10k") {
      val stats = graft.pipeline.Upsert.upsertPartitions(spark, delta, path,
        "day", keys = Seq("id"), order = Seq("version"))
      println(s"[upsert-probe] touched=${stats.touchedPartitions} merged=${stats.mergedRows}")
    }
    spark.stop()
  }
}
