package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ScoredId, TopKByScore}

/** TopKByScore: any reduce order and any merge split must equal the
  * reference sort-take — the invariant that makes the bounded aggregate a
  * drop-in for a ranking window.
  */
class TopKSpec extends AnyFunSuite {

  private def better(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  test("random reduce orders and merge splits match reference sort-take") {
    val rnd = new scala.util.Random(7)
    val agg = new TopKByScore(5)
    for (trial <- 1 to 50) {
      val n = 1 + rnd.nextInt(40)
      val data = rnd.shuffle((0 until n).toList).map(i =>
        (0L, i.toLong, (rnd.nextInt(8) / 4.0))) // many score ties
      val ref = data.map(t => ScoredId(t._3, t._2)).sortWith(better).take(5)

      // split into random partitions, reduce each, merge pairwise
      val parts = data.grouped(1 + rnd.nextInt(7)).toSeq
      val partials = parts.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = partials.reduce(agg.merge)
      assert(agg.finish(merged) == ref, s"trial $trial")
    }
  }

  test("keeps fewer than k when the group is small") {
    val agg = new TopKByScore(10)
    val out = agg.finish(agg.reduce(agg.reduce(agg.zero, (0L, 7L, 0.5)), (0L, 3L, 0.9)))
    assert(out == Seq(ScoredId(0.9, 3L), ScoredId(0.5, 7L)))
  }
}
