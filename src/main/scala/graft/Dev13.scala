package graft

import org.apache.spark.sql.SparkSession

/** Throwaway round-13 perf probe (dev only): times the named SparkEntry
  * queries at sf0.1, min-of-2, through the noop sink.
  */
object Dev13 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.sources.Tables.NanosAsLongConf, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    val names = if (args.nonEmpty) args.toSeq else Seq("recs_copurchase", "recs_lift")
    if (sys.env.contains("DEV13_EXPLAIN")) {
      names.foreach { name =>
        val df = SparkEntry.queries(name)(spark, dir)
        df.queryExecution.toRdd.count()
        println(s"=== $name ===")
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
      spark.stop(); return
    }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[dev13] $name%-24s min ${runs.min}%.2f s  runs ${runs.map(r => f"$r%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
