package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.expr.Sketches
import graft.sources.Tables

/** The replayable-sketch contracts (Sketches scaladoc): the hash is the
  * specified modular arithmetic, results are partition-order-invariant
  * (the distributed property the DuckDB oracle can't see), the exact
  * small-set path engages below k, and the estimators respect their
  * error bounds at sf0.1 against exact ground truth.
  */
class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("mhash61 matches the BigInt reference formula") {
    val M = BigInt(Sketches.M)
    def ref(x: Long): Long = {
      val h1 = (BigInt(Sketches.A) * x + Sketches.B) mod M
      val y = h1 ^ (h1 >> 31)
      ((BigInt(Sketches.A2) * y + Sketches.B2) mod M).toLong + 1
    }
    val xs = Seq(0L, 1L, 2L, 31L, 1L << 31, 1L << 60, Sketches.M - 1,
      Sketches.M, Sketches.M + 7, Long.MaxValue, 123456789012345L)
    import spark.implicits._
    val got = xs.toDF("x").select(Sketches.mhash61(col("x")))
      .collect().map(_.getLong(0))
    xs.zip(got).foreach { case (x, g) =>
      assert(g == ref(x), s"hash($x)")
      assert(g >= 1 && g <= Sketches.M)
    }
  }

  test("mhash61 fails fast on negative input instead of silently diverging") {
    // for x < 0 the JVM arithmetic and the DuckDB SQL mirror disagree, so
    // the sketch would stop being cross-engine replayable with no local
    // symptom — the contract violation must surface at the source
    import spark.implicits._
    // local-relation eval surfaces the IAE directly; a parquet-backed scan
    // wraps it in SparkException — accept either, require the message
    val e = intercept[Exception] {
      Seq(-1L).toDF("x").select(Sketches.mhash61(col("x"))).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(_.contains("non-negative")), msgs.mkString(" | "))
  }

  test("kmv and bottom-k sample are partition-layout invariant") {
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
      .select(col("event_type"), Sketches.mhash61(col("event_id")).as("h"),
        col("value"))
    def run(df: org.apache.spark.sql.DataFrame): (Map[String, Long], Map[String, Seq[Double]]) = {
      val kmv = df.groupBy("event_type")
        .agg(Sketches.kmvDistinct(col("h"), 256).as("est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val smp = df.groupBy("event_type")
        .agg(Sketches.bottomKSample(col("h"), col("value"), 64).as("s"))
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
      (kmv, smp)
    }
    val a = run(ev.coalesce(1))
    val b = run(ev.repartition(13, col("value")))
    val c = run(ev.repartition(32, col("event_id")))
    assert(a == b && b == c,
      "sketch results must not depend on partitioning or encounter order")
  }

  test("kmv reports exact distinct-hash counts below k") {
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
    val got = ev.groupBy("event_type")
      .agg(Sketches.kmvDistinct(Sketches.mhash61(col("user_id")), 1024)
        .as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact, "below k the sketch IS the exact count")
  }

  test("kmv estimator within 4 rsd of exact at sf0.1") {
    val k = 256
    val rsd = 1.0 / math.sqrt(k - 2.0)
    val ev = Tables.events(spark, "/root/testdata/sf0.1")
    val est = ev.groupBy("event_type")
      .agg(Sketches.kmvDistinct(Sketches.mhash61(col("event_id")), k).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("event_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, n) =>
      val rel = math.abs(est(t).toDouble - n) / n
      assert(n > k && rel <= 4 * rsd,
        s"$t: est=${est(t)} exact=$n rel=$rel bound=${4 * rsd}")
    }
  }

  test("sampled quantiles track exact quantiles at sf0.1") {
    val ev = Tables.events(spark, "/root/testdata/sf0.1")
    val sampled = ev
      .groupBy("event_type")
      .agg(Sketches.bottomKSample(
        Sketches.mhash61(col("event_id")), col("value"), 512).as("s"))
      .select(col("event_type"), explode(col("s")).as("v"))
      .groupBy("event_type")
      .agg(expr("percentile(v, array(0.5D, 0.9D))").as("qs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val exact = ev.groupBy("event_type")
      .agg(expr("percentile(value, array(0.5D, 0.9D))").as("qs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    // rank error of a k-sample quantile ~ sqrt(p(1-p)/k); 4 sigma on the
    // VALUE scale via the fixture's ~uniform value range (span/1.0 density)
    exact.foreach { case (t, eq) =>
      val span = 200.0 // events.value spans ~[0, 200] uniformly
      Seq(0 -> 0.5, 1 -> 0.9).foreach { case (i, p) =>
        val tol = 4 * math.sqrt(p * (1 - p) / 512) * span
        assert(math.abs(sampled(t)(i) - eq(i)) <= tol,
          s"$t p$p: sampled=${sampled(t)(i)} exact=${eq(i)} tol=$tol")
      }
    }
  }

  test("KMV states are mergeable: k-min of union equals merge of truncated states") {
    // the soundness property behind the sketch_merge_7d rollup: keeping
    // only each partition's k smallest hashes loses NOTHING for the
    // merged k-minimum — the global k smallest each survive their own
    // partition's cut (they are among its k smallest by definition)
    val k = 16
    val rnd = new scala.util.Random(42)
    val partA = Seq.fill(200)(rnd.nextLong().abs % 1000000L).distinct
    val partB = Seq.fill(200)(rnd.nextLong().abs % 1000000L).distinct
    def kmin(xs: Seq[Long]): Seq[Long] = xs.distinct.sorted.take(k)
    val direct = kmin(partA ++ partB)
    val merged = kmin(kmin(partA) ++ kmin(partB))
    assert(direct == merged)
    // and the estimator over the merged state is the estimator over the
    // direct union (same k-th minimum)
    assert(direct.lift(k - 1) == merged.lift(k - 1))
  }
}
