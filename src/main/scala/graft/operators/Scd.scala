package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) history builder.
  *
  * The reference's dimensions are latest-only snapshots — each `CREATE OR
  * REPLACE TABLE dim_*` keeps one row per natural key (reference
  * sql/bq_dim_patient.sql:1-9) and discards attribute history. A warehouse
  * that must answer "what was this entity's attribute AS OF time t" needs
  * the Type-2 form: one row per (key, attribute-run) with
  * `effective_from`/`effective_to` validity bounds and an `is_current`
  * flag. This operator derives that history from the deduped fact itself,
  * collapsing consecutive equal observations into runs.
  *
  * Shape: window-only, a SINGLE hash shuffle on the entity key. Run
  * detection (`lag`), run numbering (`row_number` over change rows), the
  * closing bound (`lead`) and the run length all ride the same
  * `partitionBy(key)` exchange — the change-row filter and second window
  * only re-sort locally. No groupBy pass: the run aggregate (its event
  * count) is `next_rn - rn` over the already-numbered rows, so history for
  * a 100-TB fact costs one shuffle of (key, ts, attr) triples, and skewed
  * keys split under AQE like any other single-exchange window.
  */
object Scd {

  /** Type-2 history of `attrCol` per `keyCol`, ordered by (`tsUsCol`,
    * `tieCol`). Emits one row per run: the attribute value, its
    * [effective_from_us, effective_to_us) validity interval (null `to` =
    * open/current), the run's observation count, and `is_current`.
    */
  def history(rows: DataFrame, keyCol: String, attrCol: String,
              tsUsCol: String, tieCol: String): DataFrame = {
    val key = col(keyCol)
    val ts = col(tsUsCol)
    val tie = col(tieCol)
    val attr = col(attrCol)
    val w = Window.partitionBy(key).orderBy(ts, tie)

    val prev: Column = lag(attr, 1).over(w)
    val marked = rows
      .select(key, ts, tie, attr)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("chg", prev.isNull || prev =!= attr)
      .withColumn("n_total", count(lit(1)).over(Window.partitionBy(key)).cast("long"))

    // change rows open each run; the next change row (same key) closes it
    val wRuns = Window.partitionBy(key).orderBy(col("rn"))
    marked.filter(col("chg"))
      .withColumn("version", row_number().over(wRuns).cast("long"))
      .withColumn("effective_to_us", lead(ts, 1).over(wRuns))
      .withColumn("next_rn", lead(col("rn"), 1).over(wRuns))
      .select(
        key,
        col("version"),
        attr,
        ts.as("effective_from_us"),
        col("effective_to_us"),
        coalesce(col("next_rn") - col("rn"), col("n_total") - col("rn") + 1)
          .as("n_events"),
        col("effective_to_us").isNull.as("is_current"))
  }

  /** The engine's user dimension in Type-2 form: each user's `event_type`
    * runs over the deduped fact — the AS-OF-queryable companion to the
    * latest-only [[Dims.dimUser]].
    */
  def userTypeHistory(fact: DataFrame): DataFrame =
    history(
      fact.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type")),
      "user_id", "event_type", "ts_us", "event_id")
}
