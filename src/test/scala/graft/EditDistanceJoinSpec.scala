package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EntityResolution

/** Unblocked edit-distance join: the prefix-filtered operator must return
  * EXACTLY the brute-force pair set — completeness through every filter
  * (prefix, short-string fallback, length) on adversarial inputs:
  * duplicate-gram strings, sub-q strings, empty strings, hot shared
  * prefixes, and both k/q settings.
  */
class EditDistanceJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def bruteForce(xs: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] =
    (for {
      (ia, ta) <- xs; (ib, tb) <- xs if ia < ib
      d = lev(ta, tb) if d <= k
    } yield (ia, ib, d)).toSet

  private def run(xs: Seq[(Long, String)], k: Int, q: Int): Set[(Long, Long, Int)] =
    EntityResolution.editDistanceJoin(
        xs.toDF("id", "text"), "id", "text", k, q)
      .selectExpr("id_a", "id_b", "dist")
      .as[(Long, Long, Int)].collect().toSet

  test("matches brute force on adversarial strings (k=1 and k=2, q=2 and q=3)") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abc0"
    def randStr(maxLen: Int) =
      (0 until rnd.nextInt(maxLen + 1)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    // random short strings over a tiny alphabet: many duplicates, many
    // duplicate grams, many genuine near-matches, lengths 0..8
    val xs = (0L until 120L).map(i => (i, randStr(8)))
    for (k <- Seq(1, 2); q <- Seq(2, 3)) {
      assert(run(xs, k, q) == bruteForce(xs, k), s"mismatch at k=$k q=$q")
    }
  }

  test("hot shared prefixes stay exact (the customer-name shape)") {
    val xs = (1L to 300L).map(i => (i, f"Customer#$i%09d"))
    val got = run(xs, 1, 2)
    assert(got == bruteForce(xs, 1))
    assert(got.nonEmpty, "digit-neighbor names must produce matches")
    assert(got.forall(_._3 == 1))
  }

  test("duplicate-gram strings join bag-exactly") {
    val xs = Seq((1L, "00000000"), (2L, "00000001"), (3L, "0000"),
      (4L, "11111111"), (5L, ""), (6L, "0"), (7L, "1"))
    for (k <- Seq(1, 2)) assert(run(xs, k, 2) == bruteForce(xs, k))
  }
}
