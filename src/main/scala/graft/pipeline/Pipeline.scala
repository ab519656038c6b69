package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Dims, Monitoring, Quality, Star}
import graft.sources.Tables

/** Dependency-ordered pipeline runner — the engine's analog of the
  * reference's scheduled-query DAG: land → fact (dedup) → dims → star →
  * monitoring views (reference README.md:688-692; semantics 675-681).
  * Every model table is an idempotent overwrite snapshot (S3, line 1 of
  * every reference sql file), so re-runs converge to the same state — deterministic
  * content-hash keys make that byte-stable.
  *
  * Physical layout (S4, reference sql/bq_fact_vitals_star.sql:2-3 +
  * README.md:598): the star fact is written `partitionBy(date_key)` —
  * Catalyst prunes day partitions on date predicates exactly like BigQuery
  * partition pruning — and `sortWithinPartitions(user_key, event_type_key)`
  * inside each day, giving parquet row-group min/max stats the same skip
  * power as BQ clustering.
  */
object Pipeline {

  case class StageResult(stage: String, rows: Long, path: String)

  def run(spark: SparkSession, srcDir: String, outDir: String): Seq[StageResult] = {
    val results = Seq.newBuilder[StageResult]

    def save(df: DataFrame, name: String): DataFrame = {
      val path = s"$outDir/$name"
      df.write.mode(SaveMode.Overwrite).parquet(path)
      val back = spark.read.parquet(path)
      results += StageResult(name, back.count(), path)
      back
    }

    // land (S2 analog: in production an append into the landing zone; the
    // snapshot build consumes whatever has landed)
    val landed = save(Tables.events(spark, srcDir), "landing_events")

    // fact: W1 keep-latest dedup
    val fact = save(Dedup.latestEvents(landed), "fact_events")

    // dims (dependency-ordered after fact, before star)
    val dimUser = save(Dims.dimUser(fact), "dim_user")
    val dimType = save(Dims.dimEventType(fact), "dim_event_type")
    val dimDate = save(Dims.dimDate(fact), "dim_date")

    // star: broadcast join + partitioned/clustered layout, consuming ONLY
    // the materialized stage outputs (see starFromMaterialized's scaladoc —
    // the on-disk dims are what keep the star's joins skew-splittable)
    val starPath = s"$outDir/fact_events_star"
    starFromMaterialized(spark, outDir)
      .repartition(col("date_key"))
      .sortWithinPartitions(col("user_key"), col("event_type_key"))
      .write.mode(SaveMode.Overwrite).partitionBy("date_key").parquet(starPath)
    val star = spark.read.parquet(starPath)
    results += StageResult("fact_events_star", star.count(), starPath)

    // monitoring views (S5: lazy, recomputed per query)
    Monitoring.results(landed).createOrReplaceTempView("mon_results")
    Monitoring.lastStatus(landed).createOrReplaceTempView("mon_last_status")
    Monitoring.dailySummary(landed).createOrReplaceTempView("mon_daily_summary")
    Monitoring.sevenDaySummary(landed).createOrReplaceTempView("mon_7d_summary")
    Monitoring.errors(landed).createOrReplaceTempView("mon_errors")

    // quality gates (reference README.md:622-670) — fail loudly, like the
    // reference's manual sanity checks would
    val ri = Quality.referentialIntegrity(fact, dimUser, dimType, dimDate).first()
    require(ri.getLong(0) == 0 && ri.getLong(1) == 0 && ri.getLong(2) == 0,
      s"referential integrity violated: $ri")
    val parity = Quality.countParity(fact, star).first()
    require(parity.getAs[Long]("delta") == 0L, s"fact/star count mismatch: $parity")

    results.result()
  }

  /** The star build over the pipeline's MATERIALIZED stage outputs — every
    * input is an on-disk parquet scan, never the aggregate that built it.
    *
    * This layout is load-bearing for skew handling at scale, not a style
    * choice: AQE's OptimizeSkewedJoin can only split a skewed join child
    * that is a bare shuffle-stage, and a dimension feeding the join
    * STRAIGHT FROM its building aggregate puts a HashAggregate between the
    * stage and the join, which the rule's pattern cannot replicate — the
    * hot partition stays whole and one task eats 90% of the fact (measured
    * while writing `SkewStatefulSpec`: the same 90%-hot-user join splits
    * with `skew=true` over a materialized dim and does NOT split over an
    * in-lineage dim). At 100 TB "dims land on disk before the star reads
    * them" is therefore a hard sequencing constraint of the refresh DAG —
    * the reference encodes the same ordering in its scheduled-query
    * dependencies (reference README.md:688-692). `PipelineSpec` asserts
    * the no-aggregate-in-lineage plan shape; salting (`Skew.saltedJoin`)
    * remains the fallback for joins that cannot be fed from disk.
    */
  def starFromMaterialized(spark: SparkSession, outDir: String): DataFrame =
    Star.factStar(
      spark.read.parquet(s"$outDir/fact_events"),
      spark.read.parquet(s"$outDir/dim_user"),
      spark.read.parquet(s"$outDir/dim_event_type"),
      spark.read.parquet(s"$outDir/dim_date"))

  /** Bucketed-layout star rebuild (S4 at the big-dimension regime): the fact
    * and the user dimension land `bucketBy(buckets, user_id)` +
    * `sortBy(user_id)` as tables, and the star is rebuilt FROM DISK with
    * [[Star.factStarCoLocated]] — the fact/user join becomes a sort-merge
    * join over co-located bucketed scans with zero shuffle on either side.
    * This is the layout story for when dim_user outgrows broadcast: pay the
    * bucketed write once, then every star rebuild (and any other user_id
    * join against either table) is exchange-free. The tiny event-type/date
    * dims go through the ordinary parquet write + broadcast path.
    *
    * Returns the lazy star rebuild over the on-disk tables (callers sink it;
    * `PipelineSpec` asserts the exchange-free plan shape).
    */
  def runBucketedStar(spark: SparkSession, srcDir: String, outDir: String,
                      buckets: Int = 8): DataFrame = {
    val fact = Dedup.latestEvents(Tables.events(spark, srcDir))
    spark.sql("DROP TABLE IF EXISTS fact_events_bkt")
    spark.sql("DROP TABLE IF EXISTS dim_user_bkt")
    // EXTERNAL tables under the caller's outDir: a managed location in the
    // session warehouse outlives the in-memory catalog, so a fresh session
    // rerunning this would hit LOCATION_ALREADY_EXISTS on the leftover dir
    // (the catalog's DROP can't see a table it never registered)
    fact.write.bucketBy(buckets, "user_id").sortBy("user_id")
      .option("path", s"$outDir/fact_events_bkt")
      .mode(SaveMode.Overwrite).saveAsTable("fact_events_bkt")
    Dims.dimUser(fact).write.bucketBy(buckets, "user_id").sortBy("user_id")
      .option("path", s"$outDir/dim_user_bkt")
      .mode(SaveMode.Overwrite).saveAsTable("dim_user_bkt")
    // tiny dims: plain parquet, read back (so the rebuild plan below is all
    // scans — no aggregation exchanges from dim construction lineage)
    Dims.dimEventType(fact).write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/dim_event_type")
    Dims.dimDate(fact).write.mode(SaveMode.Overwrite).parquet(s"$outDir/dim_date")

    Star.factStarCoLocated(
      spark.table("fact_events_bkt"),
      spark.table("dim_user_bkt"),
      spark.read.parquet(s"$outDir/dim_event_type"),
      spark.read.parquet(s"$outDir/dim_date"))
  }
}
