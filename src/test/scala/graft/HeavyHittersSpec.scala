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
