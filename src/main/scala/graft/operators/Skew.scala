package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §4; the builder-prompt scale list:
  * "salting for skew, AQE for runtime re-plan").
  *
  * AQE's skew-join splitting handles most runtime skew automatically; these
  * helpers cover the two shapes AQE does not: a single hot group in an
  * aggregation, and a broadcast-infeasible join against a skewed key.
  */
object Skew {

  /** Two-stage salted aggregation: groupBy(key, salt) partial-aggregates the
    * hot key across `saltBuckets` partitions, then the tiny salted result
    * re-aggregates on the key alone. Works for any algebraic aggregate
    * (sum/count/min/max); here count+sum as the common case.
    */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
                     saltBuckets: Int = 32): DataFrame =
    df.groupBy(key.as("key"), pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)).as("__salt"))
      .agg(count(lit(1)).as("__cnt"), sum(value).as("__sum"))
      .groupBy(col("key"))
      .agg(sum(col("__cnt")).as("n"), sum(col("__sum")).as("total"))

  /** Salted join for a skewed left key against a small-but-not-broadcastable
    * right side: left gets a random salt in [0, saltBuckets), right is
    * replicated once per salt value, and the join key becomes (key, salt) —
    * the hot key's rows spread over `saltBuckets` tasks instead of one.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltBuckets: Int = 8): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets)))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }
}
