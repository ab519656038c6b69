package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic vitals generator — the engine's stand-in for the
  * reference's row-at-a-time FHIR-ish ingest service (operator S7/G1;
  * reference fastapi-ingest/_endpoint.py:12-34: uuid4 event ids, patients
  * uniform over {P001,P002,P003}, constant LOINC 8867-4 "Heart rate",
  * value uniform(60,100) rounded to 1 decimal, unit "beats/min", source
  * "synthetic", JSON note payload, server-side timestamps).
  *
  * Distributed + reproducible: built on spark.range (parallel, no driver
  * loop) with seeded rand() and content-derived event ids, so any cluster
  * size regenerates identical data.
  */
object VitalsGen {

  /** `n` events, one per minute starting at `startEpochSec`. */
  def vitals(spark: SparkSession, n: Long, startEpochSec: Long, seed: Long = 42L): DataFrame =
    spark.range(n).select(
      // uuid4-shaped deterministic id from the row number (md5 → 8-4-4-4-12)
      concat_ws("-",
        substring(md5(concat(lit("evt"), col("id"))), 1, 8),
        substring(md5(concat(lit("evt"), col("id"))), 9, 4),
        substring(md5(concat(lit("evt"), col("id"))), 13, 4),
        substring(md5(concat(lit("evt"), col("id"))), 17, 4),
        substring(md5(concat(lit("evt"), col("id"))), 21, 12)).as("event_id"),
      element_at(
        array(lit("P001"), lit("P002"), lit("P003")),
        (floor(rand(seed) * 3) + 1).cast("int")).as("patient_id"),
      lit("8867-4").as("loinc_code"),
      lit("Heart rate").as("code_display"),
      round(rand(seed + 1) * 40 + 60, 1).as("value_num"),
      lit("beats/min").as("unit"),
      timestamp_seconds(lit(startEpochSec) + col("id") * 60).as("effective_ts"),
      lit("synthetic").as("source"),
      to_json(struct(lit("fastapi demo").as("note"))).as("raw"))

  /** One replication batch (operator S1): the windowed extract
    * `effective_ts >= hi - lookback` stamped with a load-time `created_at`
    * (the dedup tiebreaker, reference sql/postgres_ddl.sql:11). Overlapping
    * lookbacks across consecutive batches produce the duplicate rows the
    * W1 dedup must repair (reference README.md:364,382).
    */
  def extractBatch(oltp: DataFrame, hiEpochSec: Long, lookbackMinutes: Int): DataFrame =
    oltp
      .filter(col("effective_ts") >= timestamp_seconds(lit(hiEpochSec - lookbackMinutes * 60L)) &&
        col("effective_ts") < timestamp_seconds(lit(hiEpochSec)))
      .withColumn("created_at", timestamp_seconds(lit(hiEpochSec)))
}
