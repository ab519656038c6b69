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
    // SCRATCH_N-row scale probe: generator -> dedup -> dims -> star, timed
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
    time(s"dedup-window ${n/1000000}M") {
      Dedup.keepFirst(ev, Seq("event_id"), Seq(col("ts").desc))
        .write.format("noop").mode("overwrite").save()
    }
    time(s"dedup-agg ${n/1000000}M") {
      Dedup.keepLatestAgg(ev, Seq("event_id"), Seq(col("ts")))
        .write.format("noop").mode("overwrite").save()
    }
    time(s"dedup-agg ${n/1000000}M 2nd") {
      Dedup.keepLatestAgg(ev, Seq("event_id"), Seq(col("ts")))
        .write.format("noop").mode("overwrite").save()
    }
    // experiment: max_by(struct,struct) plans as SortAggregate (struct
    // buffer defeats HashAggregateExec). Candidate replacement: two-phase —
    // phase 1 max(packed-long) IS hash-aggregable (primitive buffer,
    // map-side combine), phase 2 joins the winners back to fetch payloads.
    // Costs a second full shuffle of the input for the join vs one
    // shuffle + sort; measured numbers in BASELINE.md decide what ships.
    def twoPhase(): Unit = {
      val latest = ev.groupBy(col("event_id"))
        .agg(max(unix_micros(col("ts"))).as("__ord"))
      ev.withColumn("__ord", unix_micros(col("ts")))
        .join(latest, Seq("event_id", "__ord"))
        .drop("__ord")
        .write.format("noop").mode("overwrite").save()
    }
    time(s"dedup-2phase ${n/1000000}M") { twoPhase() }
    time(s"dedup-2phase ${n/1000000}M 2nd") { twoPhase() }
    time(s"star ${n/1000000}M") {
      Star.factStar(Dedup.keepFirst(ev, Seq("event_id"), Seq(col("ts").desc)),
        Dims.dimUser(ev), Dims.dimEventType(ev), Dims.dimDate(ev))
        .write.format("noop").mode("overwrite").save()
    }
    // the full monitoring-view suite over a JSON payload at probe scale
    // (explode-fused single parse — round-1's filter-pushdown double parse
    // cost 2×; errors() fuses the failure predicate into the generator so
    // the sort and its sampling pass carry only failed rows)
    val evK = ev.withColumn("props",
      to_json(struct(pmod(xxhash64(col("event_id")), lit(150)).as("k"))))
    for (nm <- Seq("mon_results", "mon_last_status", "mon_daily", "mon_7d",
        "mon_errors")) {
      val df = nm match {
        case "mon_results" => graft.operators.Monitoring.results(evK)
        case "mon_last_status" => graft.operators.Monitoring.lastStatus(evK)
        case "mon_daily" => graft.operators.Monitoring.dailySummary(evK)
        case "mon_7d" => graft.operators.Monitoring.sevenDaySummary(evK)
        case "mon_errors" => graft.operators.Monitoring.errors(evK)
      }
      time(nm) { df.write.format("noop").mode("overwrite").save() }
    }
    // skew-join probe: 10M left rows with 90% on ONE key joined to a
    // non-broadcastable right side, AQE + auto-broadcast off so the salted
    // form is measured against the true single-hot-task baseline (AQE's
    // skew split would otherwise rescue the plain join at runtime —
    // production turns it on; the probe isolates the operator)
    {
      val skewN = math.min(n, 10000000L)
      val left = spark.range(skewN).select(
        when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 1000).as("k"),
        (col("id") % 97).cast("double").as("v"))
      val right = spark.range(1000).select(col("id").as("k"),
        concat(lit("dim_"), col("id")).as("label"))
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      time(s"skew-join plain ${skewN / 1000000}M") {
        left.join(right, "k")
          .write.format("noop").mode("overwrite").save()
      }
      time(s"skew-join salted ${skewN / 1000000}M") {
        graft.operators.Skew.saltedJoin(left, right, "k")
          .write.format("noop").mode("overwrite").save()
      }
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
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
