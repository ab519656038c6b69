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
    // monitoring rollups over a JSON payload at probe scale (explode-fused
    // single parse — round-1's filter-pushdown double parse cost 2×)
    val evK = ev.withColumn("props",
      to_json(struct(pmod(xxhash64(col("event_id")), lit(150)).as("k"))))
    time("mon_daily") {
      graft.operators.Monitoring.dailySummary(evK)
        .write.format("noop").mode("overwrite").save()
    }
    time("mon_7d") {
      graft.operators.Monitoring.sevenDaySummary(evK)
        .write.format("noop").mode("overwrite").save()
    }
    // ANN brute top-k over 1M synthetic 64-dim vectors: codegen'd cosine +
    // bounded TopKByScore aggregate (no global ranking window)
    val embs = spark.range(1000000).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 63), i -> sin(id * 131 + i))").as("embedding"))
    time("ann-topk 1M") {
      graft.operators.Ann.bruteTopK(embs, 10, 5)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
