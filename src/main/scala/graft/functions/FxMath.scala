package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Integer-exact rounding of rationals — the cross-engine hash-stability
  * primitive.
  *
  * `round(double, k)` is NOT portable at half-way boundaries: Spark rounds
  * the shortest-decimal form of the double (BigDecimal HALF_UP) while other
  * engines round in floating point (scale, nearbyint, divide), and a ratio
  * of integers like 13498250/200000 = 67.49125 sits exactly on the
  * boundary — the sf0.1 audit caught Spark answering 67.4913 where DuckDB
  * answered 67.4912. These helpers compute
  * `round-half-away-from-zero(num/den, k)` entirely in integer arithmetic —
  * `sign · ((2·|num·10^k| + den) intdiv (2·den))` — then perform ONE
  * exact-integer-to-double division, so every engine that can divide
  * integers agrees bit-for-bit.
  */
object FxMath {

  /** round-half-away-from-zero of num/den (den > 0) as a LONG.
    * Pure integer arithmetic: no double ever touches the boundary.
    */
  def roundedDiv(num: Column, den: Column): Column = {
    val q = call_function("div", abs(num) * 2 + den, den * 2)
    when(num < 0, -q).otherwise(q)
  }

  /** round(num/den, k) for integer-typed columns, as DOUBLE. */
  def ratio(num: Column, den: Column, k: Int): Column = {
    val s = math.pow(10, k).toLong
    roundedDiv(num * s, den).cast("double") / s.toDouble
  }

  /** round(sumScaled/scale, k) where `sumScaled` is an exact long sum of
    * per-row `round(x·scale)` values and scale = 10^p ≥ 10^k. Reduced to
    * `roundedDiv(sumScaled, scale/10^k)` before scaling so the intermediate
    * stays far from Long overflow.
    */
  def scaledTotal(sumScaled: Column, scale: Long, k: Int): Column = {
    val s = math.pow(10, k).toLong
    require(scale % s == 0, s"scale $scale must be a multiple of 10^$k")
    roundedDiv(sumScaled, lit(scale / s)).cast("double") / s.toDouble
  }

  /** round(sumScaled/(n·scale), k): the fixed-point mean. Reduced by
    * gcd(10^k, scale) like [[scaledTotal]].
    */
  def scaledAvg(sumScaled: Column, n: Column, scale: Long, k: Int): Column = {
    val s = math.pow(10, k).toLong
    if (scale >= s) {
      require(scale % s == 0, s"scale $scale must be a multiple of 10^$k")
      roundedDiv(sumScaled, n * (scale / s)).cast("double") / s.toDouble
    } else {
      require(s % scale == 0, s"10^$k must be a multiple of scale $scale")
      roundedDiv(sumScaled * (s / scale), n).cast("double") / s.toDouble
    }
  }
}
