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
}
