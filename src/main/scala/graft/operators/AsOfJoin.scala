package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: each left row picks the latest right row with
  * `rightTs <= leftTs` for the same key — the time-series operator the
  * builder guide lists as Spark's canonical missing operator.
  *
  * Built by composition (preference order (a) in SURVEY.md §7 / the build
  * guide): tag both sides, union, and take `last(value, ignoreNulls)` over a
  * (key, time)-ordered running window. One shuffle on (key), one sort —
  * exactly the cost of the sort-merge as-of a custom SparkPlan would
  * implement, so a custom LogicalPlan+Strategy would only shave the union
  * overhead, not the shuffle. Right rows sort before left rows at equal
  * timestamps (ASOF `>=` semantics).
  *
  * Scale: state per key is one running value inside the sort — no buffering
  * of the right side, no broadcast; skewed keys are AQE's problem like any
  * window.
  */
object AsOfJoin {

  /** @param left      rows to enrich
    * @param right     versioned lookup side
    * @param key       equi-join key column name (both sides)
    * @param ts        event-time column name (both sides)
    * @param rightVals right-side columns to carry as-of (renamed as given)
    */
  def asof(left: DataFrame, right: DataFrame, key: String, ts: String,
           rightVals: Map[String, String]): DataFrame = {
    val leftCols = left.columns
    val tagged =
      left.select((leftCols.map(col) :+ lit(1).as("__is_left")).toIndexedSeq: _*)
        .unionByName(
          right.select(
            (Seq(col(key), col(ts), lit(0).as("__is_left")) ++
              rightVals.map { case (from, to) => col(from).as(s"__r_$to") }): _*),
          allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightVals.values.foldLeft(tagged) { (df, to) =>
      df.withColumn(s"__asof_$to", last(col(s"__r_$to"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__is_left") === 1)
      .select((leftCols.map(col) ++
        rightVals.values.map(to => col(s"__asof_$to").as(to))).toIndexedSeq: _*)
  }
}
