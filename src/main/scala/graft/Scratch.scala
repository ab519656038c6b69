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
    // 10M-row scale probe: generator -> dedup -> dims -> star, timed
    import graft.operators.{Dedup, Dims, Star}
    import org.apache.spark.sql.functions._
    val n = sys.env.getOrElse("SCRATCH_N", "10000000").toLong
    val oltp = graft.gen.VitalsGen.vitals(spark, n, 1700000000L)
      .withColumnRenamed("effective_ts", "ts")
      .withColumnRenamed("patient_id", "user_id")
      .withColumnRenamed("loinc_code", "event_type")
      .withColumnRenamed("value_num", "value")
      .withColumnRenamed("raw", "props")
    time(s"gen+write ${n/1000000}M") {
      oltp.write.mode("overwrite").parquet("/tmp/scale_events")
    }
    val ev = spark.read.parquet("/tmp/scale_events")
    time("dedup-window 10M") {
      Dedup.keepFirst(ev, Seq("event_id"), Seq(col("ts").desc))
        .write.format("noop").mode("overwrite").save()
    }
    time("dedup-agg 10M") {
      Dedup.keepLatestAgg(ev, Seq("event_id"), Seq(col("ts")))
        .write.format("noop").mode("overwrite").save()
    }
    time("dedup-agg 10M 2nd") {
      Dedup.keepLatestAgg(ev, Seq("event_id"), Seq(col("ts")))
        .write.format("noop").mode("overwrite").save()
    }
    time("star 10M") {
      Star.factStar(Dedup.keepFirst(ev, Seq("event_id"), Seq(col("ts").desc)),
        Dims.dimUser(ev), Dims.dimEventType(ev), Dims.dimDate(ev))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
