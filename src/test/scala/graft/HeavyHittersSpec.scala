package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HeavyHitters
import graft.operators.TextOps

/** Misra-Gries sketch semantics: exact below capacity, heavy hitters
  * survive eviction above it, distributed result matches exact counts.
  */
class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exact top-k when distinct tokens fit the capacity") {
    val docs = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val out = TextOps.heavyHitterTokens(spark, docs, 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(out == Seq("a" -> 3L, "b" -> 2L))
  }

  test("a true heavy hitter survives eviction at tiny capacity") {
    val agg = new HeavyHitters(1, capacity = 4)
    // 60% "hot" + a long tail of singletons (driver-side sketch check)
    val stream = Seq.fill(60)("hot") ++ (1 to 40).map(i => s"t$i")
    val buf = stream.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(buf).head.token == "hot")
  }

  test("count-min sketch: one-sided error within eps·N over the fixture tokens") {
    // the CMS rounds out the sketch family (HLL distinct, KLL quantiles,
    // Misra-Gries heavy hitters): estimates are built DISTRIBUTED via
    // Spark's stat.countMinSketch (mergeable partial sketches per
    // partition) and must never undercount; overshoot is bounded by eps·N
    // with confidence 1−δ, checked against exact counts on every token
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val toks = docs.select(explode(split(col("text"), " ")).as("token"))
    val eps = 0.001
    val sketch = toks.stat.countMinSketch("token", eps, 0.99, 42)
    val exact = toks.groupBy("token").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val n = exact.map(_._2).sum
    val overshootBound = (eps * n).ceil.toLong
    var maxOver = 0L
    exact.foreach { case (tok, cnt) =>
      val est = sketch.estimateCount(tok)
      assert(est >= cnt, s"CMS undercounted '$tok': $est < $cnt")
      maxOver = math.max(maxOver, est - cnt)
    }
    assert(maxOver <= overshootBound,
      s"CMS overshoot $maxOver exceeds eps*N = $overshootBound")
  }

  test("merge combines partial sketches correctly") {
    val agg = new HeavyHitters(3, capacity = 16)
    val b1 = Seq("x", "x", "y").foldLeft(agg.zero)(agg.reduce)
    val b2 = Seq("x", "z", "z", "z").foldLeft(agg.zero)(agg.reduce)
    val out = agg.finish(agg.merge(b1, b2))
    assert(out == Seq(
      graft.functions.TokenCount("x", 3L),
      graft.functions.TokenCount("z", 3L),
      graft.functions.TokenCount("y", 1L)))
  }
}
