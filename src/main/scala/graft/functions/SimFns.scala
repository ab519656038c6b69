package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector similarity primitives over `array<double>` columns — pure
  * higher-order `functions._` expressions (codegen'd, no UDFs), per the
  * preference order in SURVEY.md §7 ("compose existing ops" before custom
  * Expressions).
  *
  * The fold inside `aggregate` is sequential over the array, so results are
  * bit-deterministic for a given row — unlike a shuffled double sum.
  * Callers cast `array<float>` columns once at the boundary:
  * `col.cast("array<double>")`.
  */
object SimFns {

  /** Dot product via zip_with + sequential fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity — delegates to the native codegen'd [[graft.functions.expr.CosineSim]]
    * expression (single-pass dot+norms; the HOF composition above is kept as
    * the reference implementation but is interpreted and ~100× slower in
    * tight join loops). Null on zero/mismatched vectors.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.expr.VectorExpressions.cosineSim(a, b)
}
