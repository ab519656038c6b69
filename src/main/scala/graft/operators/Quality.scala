package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality invariants run as queries (SURVEY.md §5; reference
  * README.md:622-670 "sanity checks").
  *
  * The reference validates every build manually with (1) a count
  * reconciliation between fact_vitals and fact_vitals_star
  * (README.md:628-634) and (2) a referential-integrity probe — left-join the
  * fact to all dimensions and assert zero null keys (README.md:636-659,
  * operator J2/P9). Here both are first-class queries the harness can run
  * continuously.
  *
  * Scale notes: the RI check left-joins the bounded dims (event_type, date)
  * with broadcast hints — the fact side streams through unshuffled; the
  * user dim is linear in users so its join is hint-free (AQE broadcasts
  * while it fits). Counts are partial-aggregated.
  */
object Quality {

  /** J2/P9: rows in the fact whose natural key has no dimension row.
    * With dims derived from the same fact this must be 0 — a regression here
    * means "I likely lost rows in a join" (README.md:634).
    */
  def referentialIntegrity(fact: DataFrame, dimUser: DataFrame,
                           dimEventType: DataFrame, dimDate: DataFrame): DataFrame =
    fact
      .withColumn("date_id", to_date(col("ts")))
      .join(dimUser.select(col("user_id"), lit(true).as("has_user")),
        Seq("user_id"), "left")
      .join(broadcast(dimEventType.select(col("event_type"), lit(true).as("has_type"))),
        Seq("event_type"), "left")
      .join(broadcast(dimDate.select(col("date_id"), lit(true).as("has_date"))),
        Seq("date_id"), "left")
      .agg(
        sum(when(col("has_user").isNull, 1L).otherwise(0L)).as("missing_user"),
        sum(when(col("has_type").isNull, 1L).otherwise(0L)).as("missing_type"),
        sum(when(col("has_date").isNull, 1L).otherwise(0L)).as("missing_date"))

  /** Count reconciliation: fact rows vs star rows in one row
    * (README.md:628-634). Cross join of two 1-row aggregates — the
    * distributed form of the reference's scalar-subquery pair.
    */
  def countParity(fact: DataFrame, star: DataFrame): DataFrame =
    fact.agg(count(lit(1)).as("fact_rows"))
      .crossJoin(star.agg(count(lit(1)).as("star_rows")))
      .withColumn("delta", col("fact_rows") - col("star_rows"))

  /** Table profiling — the "ANALYZE TABLE" every pipeline runs before
    * trusting a new drop: per column, null count, exact distinct count,
    * min and max, plus the table row count. ONE pass over the data: the
    * multi-column COUNT(DISTINCT) plans as Catalyst's expand + two-phase
    * aggregate (each input row fans out once per profiled column — cost
    * is (columns × rows) map-side, one shuffle of partial states), then
    * the single result row explodes into the tall (column, stats) shape.
    * Min/max aggregate on the NATIVE type and cast to string only at the
    * edge (a string min over numeric renderings would order "10" < "9").
    */
  def profileColumns(events: DataFrame): DataFrame = {
    val e = events.select(
      col("event_id"), col("user_id"), col("event_type"),
      round(col("value") * 100).cast("long").as("value_cents"),
      unix_micros(col("ts")).as("ts_us"))
    val cols = Seq("event_id", "user_id", "event_type", "value_cents", "ts_us")
    // TWO aggregates instead of one: a string min/max buffer is immutable,
    // so mixing it into the count-distinct pipeline demoted the WHOLE
    // expand (5 rows per input row) to SortAggregate — a full sort of 5·N
    // rows. Split, the distinct pass keeps its expand on HashAggregate
    // (group key = (gid, value), primitive buffers) and the min/max pass
    // is grouping-free (no grouping keys → no sort requirement). Both
    // 1-row results broadcast-join back together.
    val minMax = e.agg(
      count(lit(1)).as("n_rows"),
      cols.flatMap { c =>
        Seq(
          (count(lit(1)) - count(col(c))).as(s"${c}__nulls"),
          min(col(c)).cast("string").as(s"${c}__min"),
          max(col(c)).cast("string").as(s"${c}__max"))
      }: _*)
    val distincts = e.agg(
      countDistinct(col(cols.head)).as(s"${cols.head}__distinct"),
      cols.tail.map(c => countDistinct(col(c)).as(s"${c}__distinct")): _*)
    minMax.crossJoin(broadcast(distincts))
      .select(col("n_rows"), explode(array(cols.map(c => struct(
          lit(c).as("col_name"),
          col(s"${c}__nulls").as("n_nulls"),
          col(s"${c}__distinct").as("n_distinct"),
          col(s"${c}__min").as("min_s"),
          col(s"${c}__max").as("max_s"))): _*)).as("p"))
      .select(col("p.col_name").as("col_name"), col("n_rows"),
        col("p.n_nulls").as("n_nulls"), col("p.n_distinct").as("n_distinct"),
        col("p.min_s").as("min_s"), col("p.max_s").as("max_s"))
  }

  /** IQR-fence outlier screen (Tukey) per event_type over exact integer
    * cents: rows outside [q1 − 1.5·IQR, q3 + 1.5·IQR]. Quartiles use
    * Catalyst's exact interpolated `percentile` — with integer inputs and
    * quarter fractions every q1/q3/fence value is EXACT in double, so the
    * DuckDB `quantile_cont` replay and the fence comparisons agree
    * bit-for-bit (same device as q_group_median; see SCALE CAVEAT on
    * exact percentile at [[TextOps]] — the sketch form is the 100-TB
    * default, this is the per-type screen where value cardinality is
    * bounded). Two scans: fences are an O(types) aggregate broadcast back
    * (dim-keyed — hint-policy-safe); the flagging pass streams.
    */
  def valueOutliers(events: DataFrame): DataFrame = {
    val e = events.select(col("event_type"),
      round(col("value") * 100).cast("long").as("cents"))
    val fences = e.groupBy(col("event_type"))
      .agg(expr("percentile(cents, 0.25D)").as("q1_cents"),
        expr("percentile(cents, 0.75D)").as("q3_cents"))
      .select(col("event_type"), col("q1_cents"), col("q3_cents"),
        (col("q1_cents") - (col("q3_cents") - col("q1_cents")) * 1.5).as("lo_fence"),
        (col("q3_cents") + (col("q3_cents") - col("q1_cents")) * 1.5).as("hi_fence"))
    e.join(broadcast(fences), Seq("event_type"))
      .groupBy(col("event_type"), col("q1_cents"), col("q3_cents"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("cents") < col("lo_fence") ||
          col("cents") > col("hi_fence"), 1L).otherwise(0L)).as("n_outliers"),
        max(when(col("cents") > col("hi_fence"), col("cents"))).as("max_outlier_cents"))
  }
}
