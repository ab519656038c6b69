package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Star-schema construction and flagship analytics (SURVEY.md §2.3 J1).
  *
  * The reference swaps natural keys for surrogate keys with a 4-way inner
  * equi-join `JOIN ... USING(...)` over tiny dimensions
  * (reference sql/bq_fact_vitals_star.sql:4-17) and lands the result
  * day-partitioned + key-clustered (bq_fact_vitals_star.sql:2-3).
  *
  * Scale notes:
  *  - The event_type and date dimensions are O(dims) — bounded regardless of
  *    fact size — so their joins carry explicit `broadcast(...)` hints →
  *    BroadcastHashJoin guaranteed, the 100 TB fact never shuffles for them.
  *  - The user dimension grows with distinct users (linear in the data), so
  *    its join is hint-free: AQE broadcasts it while it fits and degrades to
  *    a shuffle join when it doesn't, instead of OOMing on a forced build.
  *    For the billions-of-users regime, [[factStarCoLocated]] plus bucketing
  *    removes even that shuffle.
  *  - The physical layout (partitionBy(date_key) + sortWithinPartitions on
  *    the cluster keys) lives in [[graft.pipeline.Pipeline]]; queries here
  *    stay pure transformations.
  */
object Star {

  /** J1: fact × dim_user × dim_event_type × dim_date → surrogate-key fact.
    * Degenerate dimension `event_id` kept for traceability
    * (bq_fact_vitals_star.sql:10, README.md:452).
    */
  def factStar(fact: DataFrame, dimUser: DataFrame, dimEventType: DataFrame,
               dimDate: DataFrame): DataFrame =
    fact
      .withColumn("date_id", to_date(col("ts")))
      .join(dimUser.select("user_id", "user_key"), Seq("user_id"))
      .join(broadcast(dimEventType.select("event_type", "event_type_key")), Seq("event_type"))
      .join(broadcast(dimDate.select("date_id", "date_key")), Seq("date_id"))
      .select(
        col("user_key"), col("event_type_key"), col("date_key"),
        col("event_id"), col("value").as("measure_value"),
        unix_micros(col("ts")).as("ts_us"))

  /** [[factStar]] for the big-dimension regime: the user join (already
    * hint-free) is fed from tables bucketed on `user_id`
    * (see [[graft.pipeline.Pipeline.runBucketedStar]]), so Catalyst plans it
    * as a sort-merge join over co-located bucketed scans — the physical
    * layout, not a runtime broadcast, removes the shuffle: zero shuffle on
    * either side, at any fact size. The genuinely tiny dims still broadcast.
    */
  def factStarCoLocated(fact: DataFrame, dimUser: DataFrame,
                        dimEventType: DataFrame, dimDate: DataFrame): DataFrame =
    fact
      .withColumn("date_id", to_date(col("ts")))
      .join(dimUser.select("user_id", "user_key"), Seq("user_id"))
      .join(broadcast(dimEventType.select("event_type", "event_type_key")), Seq("event_type"))
      .join(broadcast(dimDate.select("date_id", "date_key")), Seq("date_id"))
      .select(
        col("user_key"), col("event_type_key"), col("date_key"),
        col("event_id"), col("value").as("measure_value"),
        unix_micros(col("ts")).as("ts_us"))

  /** Flagship: daily event count + value stats per user over the star —
    * the A6+A1 shape the reference runs over fact_vitals_star (README star
    * sanity queries). Joins back through dim_date/dim_user, then one hash
    * aggregation on (date, user).
    */
  def dailyUserActivity(star: DataFrame, dimDate: DataFrame,
                        dimUser: DataFrame): DataFrame =
    star
      .join(broadcast(dimDate.select("date_key", "date_id")), Seq("date_key"))
      // user dim is linear in users → hint-free, AQE decides
      .join(dimUser.select("user_key", "user_id"), Seq("user_key"))
      .groupBy(col("date_id"), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        // fixed-point (cents) aggregation: per-row round to an exact integer,
        // sum as long — bit-identical under any partial-aggregation order —
        // with the final rounding integer-exact (FxMath): the sf0.1 audit
        // caught round(double,4) flipping 67.49125 differently per engine
        graft.functions.FxMath.scaledAvg(
          sum(round(col("measure_value") * 100).cast("long")),
          count(lit(1)), 100L, 4).as("avg_value"),
        graft.functions.FxMath.scaledTotal(
          sum(round(col("measure_value") * 100).cast("long")), 100L, 2)
          .as("sum_value"))
}
