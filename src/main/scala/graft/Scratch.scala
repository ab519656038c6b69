package graft

import org.apache.spark.sql.SparkSession

/** Throwaway plan-inspection harness (dev only). */
object Scratch {
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
      println(f"[scratch] $name%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (name <- Seq("mon_daily_summary", "q1_pricing", "q3_top_orders", "fact_star")) {
      val q = SparkEntry.queries(name)(spark, dir)
      time(s"$name 1st") { q.write.format("noop").mode("overwrite").save() }
      time(s"$name 2nd") { q.write.format("noop").mode("overwrite").save() }
    }
    SparkEntry.queries("q1_pricing")(spark, dir).explain("formatted")
    SparkEntry.queries("fact_star")(spark, dir).explain("formatted")
    spark.stop()
  }
}
