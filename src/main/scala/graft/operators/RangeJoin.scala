package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join without a cross product — one of the operator
  * shapes vanilla Spark plans badly: an inequality-only join condition
  * becomes BroadcastNestedLoopJoin (or a cartesian product), which is
  * O(|L|·|R|) and melts at scale.
  *
  * Scale shape: both sides key on a range bucket of width `bucketWidth` —
  * points land in exactly one bucket; intervals explode into every bucket
  * they cover (a bounded fan-out of ⌈len/width⌉ + 1 rows) — then a plain
  * EQUI-join on (bucket ++ extraKeys) generates candidates and the exact
  * range predicate refines them. Candidates are bounded by bucket
  * co-residency instead of |L|×|R|, the join is hash-partitionable on both
  * sides (SMJ/BHJ, AQE, skew handling all apply), and because a point lies
  * in exactly one bucket no pair can match twice — no dedup pass.
  *
  * `bucketWidth` tunes fan-out vs selectivity: ~the median interval length
  * is the usual choice (each interval explodes into ~2 buckets).
  */
object RangeJoin {

  /** Join `points` to every row of `intervals` whose
    * `[startCol, endCol]` (inclusive) contains `pointCol`, matching any
    * `extraKeys` equi-columns as well. All three columns must be numeric
    * (e.g. epoch micros).
    */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketWidth: Long, extraKeys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pb = points.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    val ib = intervals.withColumn("__bucket",
      explode(sequence(
        floor(col(startCol) / bucketWidth).cast("long"),
        floor(col(endCol) / bucketWidth).cast("long"))))
    pb.join(ib, Seq("__bucket") ++ extraKeys)
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Interval×interval overlap join (`[aS,aE]` ∩ `[bS,bE]` ≠ ∅, inclusive).
    * Both sides explode into covering buckets and equi-join; an overlapping
    * pair co-resides in EVERY shared bucket, so the join keeps a pair only
    * in its FIRST shared bucket — `max(floor(aS/W), floor(bS/W))` — making
    * the output duplicate-free with no distinct pass (the standard
    * bucketized interval-join trick; a distinct over the candidate set
    * would be a second full shuffle).
    */
  def intervalOverlap(left: DataFrame, lStart: String, lEnd: String,
                      right: DataFrame, rStart: String, rEnd: String,
                      bucketWidth: Long, extraKeys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def buckets(df: DataFrame, s: String, e: String) = df.withColumn("__bucket",
      explode(sequence(
        floor(col(s) / bucketWidth).cast("long"),
        floor(col(e) / bucketWidth).cast("long"))))
    buckets(left, lStart, lEnd)
      .join(buckets(right, rStart, rEnd), Seq("__bucket") ++ extraKeys)
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("__bucket") === greatest(
        floor(col(lStart) / bucketWidth).cast("long"),
        floor(col(rStart) / bucketWidth).cast("long")))
      .drop("__bucket")
  }
}
