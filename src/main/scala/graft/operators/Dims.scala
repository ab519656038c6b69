package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Keys.surrogateKey

/** Dimension builders (SURVEY.md §2.4 A1-A3, §2.8 F1-F8/F15).
  *
  * The reference builds each dimension as an idempotent CTAS over the deduped
  * fact: group-by / distinct on the natural key + `TO_HEX(SHA256(key))`
  * surrogate (reference sql/bq_dim_patient.sql:1-9, bq_dim_code.sql:1-7,
  * bq_dim_unit.sql:1-8, bq_dim_source.sql:1-8), and a calendar dimension by
  * exploding `GENERATE_DATE_ARRAY(min, max)` and projecting date parts
  * (reference sql/bq_dim_time.sql:1-19).
  *
  * Fixture mapping (FIXTURES.md): events.user_id ↔ patient_id,
  * events.event_type ↔ loinc_code, events.ts ↔ effective_ts.
  *
  * Scale notes: each builder is one hash aggregation — partial (map-side)
  * aggregation makes the shuffle carry only one row per group, so dimension
  * builds cost ~O(distinct keys) network at any fact size. dim_date's bounds
  * are a 2-value global aggregate broadcast into the generator — no collect
  * of data rows to the driver.
  */
object Dims {

  /** A1: per-user activity dimension (mirrors dim_patient:
    * MIN(DATE(ts)) / MAX(DATE(ts)) / COUNT(*), bq_dim_patient.sql:5-9).
    */
  def dimUser(fact: DataFrame): DataFrame =
    fact.groupBy(col("user_id"))
      .agg(
        min(to_date(col("ts"))).as("first_seen_date"),
        max(to_date(col("ts"))).as("last_seen_date"),
        count(lit(1)).as("event_count"))
      .select(
        surrogateKey(col("user_id")).as("user_key"),
        col("user_id"), col("first_seen_date"), col("last_seen_date"),
        col("event_count"))

  /** A2/A3: code-like dimension over event_type (mirrors dim_code,
    * bq_dim_code.sql:2-7, which keeps an ANY_VALUE(code_display)
    * representative alongside the key). ANY_VALUE is partial-agg-order
    * dependent, so per SURVEY §7 risks the representative is determinized
    * as `min(event_id)` — same output shape, reproducible survivor.
    */
  def dimEventType(fact: DataFrame): DataFrame =
    fact.groupBy(col("event_type"))
      .agg(
        min(col("event_id")).as("sample_event_id"),
        count(lit(1)).as("event_count"))
      .select(
        surrogateKey(col("event_type")).as("event_type_key"),
        col("event_type"), col("sample_event_id"), col("event_count"))

  /** F15 + F2-F7: calendar dimension — one row per day between the fact's min
    * and max date (bq_dim_time.sql:3-19). `sequence(...)` ≡
    * GENERATE_DATE_ARRAY; `explode` ≡ UNNEST. Day-of-week keeps BigQuery's
    * 1=Sunday convention, which Spark's `dayofweek` already matches (SURVEY
    * §2.8 F5).
    */
  def dimDate(fact: DataFrame): DataFrame = {
    val bounds = fact.agg(
      min(to_date(col("ts"))).as("lo"),
      max(to_date(col("ts"))).as("hi"))
    bounds
      .select(explode(sequence(col("lo"), col("hi"))).as("date_id"))
      .select(
        date_format(col("date_id"), "yyyyMMdd").cast("long").as("date_key"),
        col("date_id"),
        year(col("date_id")).as("year"),
        quarter(col("date_id")).as("quarter"),
        month(col("date_id")).as("month"),
        date_format(col("date_id"), "MMMM").as("month_name"),
        weekofyear(col("date_id")).as("iso_week"),
        dayofmonth(col("date_id")).as("day_of_month"),
        dayofweek(col("date_id")).as("day_of_week"),
        date_format(col("date_id"), "EEEE").as("day_name"),
        dayofweek(col("date_id")).isin(1, 7).as("is_weekend"))
  }
}
