package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FxMath

/** FxMath integer-exact rounding ≡ exact-rational HALF_UP (BigDecimal),
  * including the half-way boundaries where round(double, k) breaks.
  */
class FxMathSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def reference(num: Long, den: Long, k: Int): Double =
    new java.math.BigDecimal(num)
      .divide(new java.math.BigDecimal(den), k, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  test("ratio matches exact-rational HALF_UP on random and boundary inputs") {
    val rnd = new scala.util.Random(11)
    val cases = Seq(
      (1349825L * 100, 200L * 100, 4), // the sf0.1 star_daily_user flip: 67.49125
      (4988L, 10000L, 4), (4987L, 10000L, 4), // text_quality neighborhood
      (1L, 2L, 4), (-1L, 2L, 4), (5L, 1000L, 2), (-5L, 1000L, 2),
      (0L, 7L, 4), (25L, 1000L, 2) // 0.025 → 0.03 half-up
    ) ++ Seq.fill(200)((rnd.nextLong() % 1000000L,
      math.abs(rnd.nextLong() % 9999L) + 1L, 1 + rnd.nextInt(6)))
    val df = cases.toDF("num", "den", "k")
    cases.map(_._3).distinct.foreach { k =>
      val got = df.filter($"k" === k)
        .select($"num", $"den", FxMath.ratio($"num", $"den", k).as("v"))
        .collect()
      got.foreach { r =>
        val exp = reference(r.getLong(0), r.getLong(1), k)
        assert(r.getDouble(2) == exp, s"num=${r.getLong(0)} den=${r.getLong(1)} k=$k")
      }
    }
  }

  test("scaledTotal and scaledAvg agree with the rational reference") {
    // value = S/scale rounded to k; avg = S/(n*scale)
    val df = Seq((674912500L, 4L)).toDF("s", "n") // S/1e4 = 67491.25 boundary
    val tot = df.select(FxMath.scaledTotal($"s", 10000L, 2).as("v")).first().getDouble(0)
    assert(tot == 67491.25) // k=2 keeps both decimals exactly
    val avg = df.select(FxMath.scaledAvg($"s", $"n", 10000L, 4).as("v")).first().getDouble(0)
    // S/(4*1e4) = 16872.8125 → 4dp exact
    assert(avg == 16872.8125)
    val avgBoundary = Seq((1349825L, 200L)).toDF("s", "n")
      .select(FxMath.scaledAvg($"s", $"n", 100L, 4).as("v")).first().getDouble(0)
    assert(avgBoundary == 67.4913) // 67.49125 rounds half away
  }
}
