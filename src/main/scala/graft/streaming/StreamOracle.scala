package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Harness glue that turns a Structured-Streaming pipeline into an
  * ORACLE-ABLE query: stage a deterministic input dir, drain the stream
  * with `Trigger.AvailableNow` into a fresh parquet sink, read the sink
  * back as a plain DataFrame. This is what lets the §2.9 streaming
  * operators (SURVEY.md — the continuous form of the reference's
  * cron-driven micro-batch refresh, reference README.md:364,688-692) carry
  * green CORRECTNESS rows instead of test-only evidence: the drained
  * output is compared to batch-equivalent DuckDB SQL over the same rows.
  *
  * Determinism contract (what makes the DuckDB hash-compare valid):
  *  - a drain with NO rate limit processes all staged files in ONE
  *    micro-batch, so the final watermark is `max(ts) − delay` and the
  *    append-mode emission set is a pure function of the data — the
  *    oracle mirrors it with a `HAVING end <= max(ts) − delay` clause;
  *  - a drain WITH `maxFilesPerTrigger` splits into per-file batches —
  *    only used where the sink is batch-split-independent (the idempotent
  *    foreachBatch star merge), never under an append-mode aggregation
  *    whose intermediate watermarks could drop late files.
  *
  * This object is harness scaffolding, not an operator: at scale the same
  * pipelines run against a live source with a resident trigger; the
  * staging step stands in for "what has landed".
  */
object StreamOracle {

  /** Stage-once cache: (session, logical key) → staged parquet dir. The
    * same staged input feeds every streaming oracle query in a Verify or
    * Bench pass, so the write happens once per session+scale, not once
    * per query invocation.
    */
  private val staged =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]

  /** Write `df` to a temp parquet dir (once per session+key) and return
    * the dir. `numFiles > 1` range-splits on `splitCol` so a rate-limited
    * drain sees one deterministic slice per micro-batch.
    */
  def stage(spark: SparkSession, df: => DataFrame, key: String,
            numFiles: Int = 1, splitCol: String = "ts"): String =
    staged.computeIfAbsent((spark, s"$key:$numFiles"), _ => {
      val dir = Files.createTempDirectory(s"graft_staged_$key").toString
      val d = df
      val out =
        if (numFiles <= 1) d.coalesce(1)
        else d.repartitionByRange(numFiles, org.apache.spark.sql.functions.col(splitCol))
      out.write.mode("overwrite").parquet(dir)
      dir
    })

  /** Open a parquet file stream over a staged dir with its on-disk schema.
    * `maxFilesPerTrigger = None` ⇒ the whole dir drains as one batch.
    */
  def fileStream(spark: SparkSession, dir: String,
                 maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    val r = spark.readStream.schema(schema)
    maxFilesPerTrigger.fold(r)(n => r.option("maxFilesPerTrigger", n)).parquet(dir)
  }

  /** State-store partition count for the harness drains — a HARNESS-SCALE
    * knob, not an engine default: every stateful micro-batch pays
    * per-partition state-store file overhead (join drains pay it ×4
    * stores), so local[32]'s session default of 32 taxes these small-SF
    * drains with fixed costs (measured: the stream-stream join drain
    * 10.6 → 2.9 s at 8 partitions, sf0.1, `StreamDrainProbe`). Results
    * are partitioning-independent (exact keyed aggregations/joins); a
    * production deployment sizes this to key cardinality and executor
    * count, not down to a fixture.
    */
  private val DrainShufflePartitions = "8"

  private def withDrainPartitions[T](spark: SparkSession)(body: => T): T = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", DrainShufflePartitions)
    try body finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Drain an append-mode streaming DataFrame into a fresh parquet sink
    * (file sinks are append-only) and read the result back. Fresh sink +
    * fresh checkpoint per call: a re-run (Bench's min-of-2) reprocesses
    * from scratch instead of replaying against stale sink state.
    */
  def drainAppend(spark: SparkSession, streamDf: DataFrame): DataFrame = withDrainPartitions(spark) {
    val out = Files.createTempDirectory("graft_stream_out").toString
    val q = streamDf.writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", s"$out/_ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(out)
  }

  /** Drain an update-mode pipeline (mapGroupsWithState — file sinks reject
    * update mode) through foreachBatch parquet appends. Safe for the
    * oracle only when the drain is single-batch: then "every update" is
    * exactly one final row per key.
    */
  def drainUpdateViaForeachBatch(spark: SparkSession, streamDs: DataFrame): DataFrame = withDrainPartitions(spark) {
    val out = Files.createTempDirectory("graft_stream_upd").toString
    val sink = s"$out/rows"
    val q = streamDs.writeStream
      .outputMode("update")
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.write.mode("append").parquet(sink)
      }
      .option("checkpointLocation", s"$out/_ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(sink)
  }
}
