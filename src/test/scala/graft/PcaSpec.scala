package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pca

/** PCA contracts: the Jacobi solver against analytically-known spectra,
  * orthonormal sign-pinned components, projection variance equal to the
  * eigenvalue (the defining property of a principal axis), retraining
  * determinism (the committed-fixture contract), and the committed
  * fixture's internal consistency (mu_dot_w really is μ·w).
  */
class PcaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  private def corpus = spark.read
    .parquet(s"$dir/embeddings.parquet")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))

  test("Jacobi matches the analytic spectrum of a hand matrix") {
    // [[2,1],[1,2]] has eigenpairs (3, (1,1)/√2) and (1, (1,−1)/√2)
    val (vals, vecs) = Pca.jacobiEigen(Array(
      Array(2.0, 1.0), Array(1.0, 2.0)))
    val order = vals.indices.sortBy(i => -vals(i))
    assert(math.abs(vals(order(0)) - 3.0) < 1e-12)
    assert(math.abs(vals(order(1)) - 1.0) < 1e-12)
    val v0 = Array(vecs(0)(order(0)), vecs(1)(order(0)))
    assert(math.abs(math.abs(v0(0)) - 1 / math.sqrt(2)) < 1e-12)
    assert(math.abs(v0(0) - v0(1)) < 1e-12, "top eigenvector is (1,1)/√2 up to sign")
  }

  test("components are orthonormal, eigenvalue-descending, sign-pinned") {
    val model = Pca.trainPca(corpus, 8)
    val w = model.components
    assert(w.length == 8 && w.forall(_.length == 64))
    for (a <- w.indices; b <- a until w.length) {
      val dot = (0 until 64).map(j => w(a)(j) * w(b)(j)).sum
      val expected = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - expected) < 1e-9, s"W[$a]·W[$b] = $dot")
    }
    assert(model.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-15))
    assert(model.eigenvalues.forall(_ >= -1e-12))
    w.foreach { row =>
      val pivot = row.indices.maxBy(j => (math.abs(row(j)), -j))
      assert(row(pivot) > 0, "largest-|w| coordinate must be positive")
    }
  }

  test("projection variance along each component equals its eigenvalue") {
    import spark.implicits._
    val model = Pca.trainPca(corpus, 4)
    val data = corpus.select(col("emb")).as[Array[Double]].collect()
    model.components.zip(model.eigenvalues).foreach { case (w, ev) =>
      val projs = data.map(x =>
        x.indices.foldLeft(0.0)((s, j) => s + (x(j) - model.mean(j)) * w(j)))
      val mu = projs.sum / projs.length
      val variance = projs.map(p => (p - mu) * (p - mu)).sum / projs.length
      assert(math.abs(variance - ev) < 1e-9 * math.max(1.0, ev),
        s"var $variance vs eigenvalue $ev")
    }
  }

  test("retraining is bit-reproducible (the committed-fixture contract)") {
    val m1 = Pca.trainPca(corpus, 8)
    val m2 = Pca.trainPca(corpus, 8)
    assert(m1.mean.sameElements(m2.mean))
    assert(m1.eigenvalues.sameElements(m2.eigenvalues))
    assert(m1.components.zip(m2.components).forall { case (a, b) => a.sameElements(b) })
  }

  test("PCA-bottleneck ANN recall vs exact brute force") {
    import spark.implicits._
    val got = operators.Pca.annPcaTopK(spark, corpus, SparkEntry.PcaFixture,
      nQueries = 10, refine = 20, k = 5)
      .select(col("q_id"), col("vec_id")).as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = operators.Ann.bruteTopK(
      spark.read.parquet(s"$dir/embeddings.parquet"), nQueries = 10, k = 5)
      .select(col("q_id"), col("vec_id")).as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, ex) =>
      got.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    // 8-of-64 dims over near-isotropic fixture vectors is PCA's worst
    // case (flat spectrum — see gen.PcaGen eigenvalues); the gate pins
    // that the bottleneck still beats random short-listing by a wide
    // margin (random 20-of-499 would land ≈ 0.04)
    assert(mean >= 0.3, s"mean recall@5 $mean")
  }

  private def topkPairs(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] = {
    import spark.implicits._
    df.select(col("q_id"), col("vec_id")).as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
  }

  private def meanRecall(got: Map[Long, Set[Long]],
                         ref: Map[Long, Set[Long]]): Double = {
    val rs = ref.map { case (q, ex) =>
      got.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size
    }
    rs.sum / rs.size
  }

  test("reduced-space IVF: pruning loses little vs the brute reduced scan, and holds the bottleneck floor vs exact") {
    val ivfPca = topkPairs(Pca.ivfPcaTopK(spark, corpus, SparkEntry.PcaFixture))
    val bruteReduced = topkPairs(Pca.annPcaTopK(spark, corpus, SparkEntry.PcaFixture))
    val exact = topkPairs(operators.Ann.bruteTopK(
      spark.read.parquet(s"$dir/embeddings.parquet"), nQueries = 10, k = 5))
    // vs the UN-pruned reduced pipeline: isolates what the nprobe/nlist
    // bucket pruning costs — the same 0.9 floor the plain-IVF gate pins
    // (coverage 8/10 lists on this weakly clustered fixture)
    val vsReduced = meanRecall(ivfPca, bruteReduced)
    info(s"ivf-pca recall@5 vs brute-reduced = $vsReduced")
    assert(vsReduced >= 0.9, s"IVF pruning loss: recall $vsReduced vs reduced brute")
    // vs exact full-precision brute: bounded by the PCA bottleneck itself
    // (8-of-64 dims over near-isotropic vectors — the annPcaTopK gate)
    val vsExact = meanRecall(ivfPca, exact)
    info(s"ivf-pca recall@5 vs exact = $vsExact")
    assert(vsExact >= 0.3, s"mean recall@5 $vsExact below the bottleneck floor")
  }

  test("sf0.1 gate: reduced-space IVF pruning loss stays at the floor") {
    val corpusBig = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val ivfPca = topkPairs(Pca.ivfPcaTopK(spark, corpusBig, SparkEntry.PcaFixture))
    val bruteReduced = topkPairs(Pca.annPcaTopK(spark, corpusBig, SparkEntry.PcaFixture))
    val vsReduced = meanRecall(ivfPca, bruteReduced)
    info(s"sf0.1 ivf-pca recall@5 vs brute-reduced = $vsReduced")
    assert(vsReduced >= 0.9, s"IVF pruning loss at sf0.1: recall $vsReduced")
  }

  test("persisted reduced-space IVF index answers identically to the inline path, reading only probed buckets") {
    val path = java.nio.file.Files.createTempDirectory("graft-ivfpca").toString
    Pca.buildIvfIndexPca(corpus, path, SparkEntry.PcaFixture)
    val queries = corpus.filter(col("vec_id") < 10)
    val fromIndex = Pca.ivfPcaTopKFromIndex(spark, path, SparkEntry.PcaFixture,
      queries, corpus, k = 5)
    val inline = Pca.ivfPcaTopK(spark, corpus, SparkEntry.PcaFixture)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("cos"), r.getAs[Int]("rk"))).toSet
    assert(rows(fromIndex) == rows(inline),
      "same committed models — disk must answer exactly like inline")
    val scan = fromIndex.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("bucket"),
      s"postings scan must prune on the bucket partition column:\n$scan")
  }

  test("reduced-space IVF-PQ index: PQ loss stays inside the refine budget, only probed buckets read") {
    val path = java.nio.file.Files.createTempDirectory("graft-ivfpqpca").toString
    Pca.buildIvfPqIndexPca(corpus, path, SparkEntry.PcaFixture)
    val queries = corpus.filter(col("vec_id") < 10)
    val pq = Pca.ivfPqPcaTopKFromIndex(spark, path, SparkEntry.PcaFixture,
      queries, corpus, k = 5)
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    // vs the uncompressed reduced-space IVF AT THE SAME re-rank budget
    // (refine=100: same rotation, same coarse quantizer, same probes,
    // same exact-re-rank list size) — the ONLY remaining difference is
    // ADC candidate selection over codes vs reduced-cosine selection
    // over projections, so this isolates pure PQ loss: the same ≥0.9
    // discipline as the plain IVF-PQ gate (AnnSpec)
    val ivfPca = pairs(Pca.ivfPcaTopK(spark, corpus, SparkEntry.PcaFixture,
      refine = 100))
    val recall = ivfPca.intersect(pairs(pq)).size.toDouble / ivfPca.size
    info(s"ivfpq-pca recall@5 vs ivf-pca@refine100 = $recall (m=4, ksub=256)")
    assert(recall >= 0.9, s"PQ-in-reduced-space recall $recall below 0.9 gate")
    // scale shape: unprobed inverted lists must never be read
    val plan = pq.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"postings scan must prune on the bucket partition column:\n$plan")
  }

  test("committed fixture is internally consistent: mu_dot_w = μ·w") {
    import spark.implicits._
    val mean = spark.read.parquet(s"${SparkEntry.PcaFixture}/mean")
      .as[(Int, Double)].collect().sortBy(_._1).map(_._2)
    val comps = spark.read.parquet(s"${SparkEntry.PcaFixture}/components")
      .select(col("comp"), col("w"), col("mu_dot_w"), col("eigenvalue"))
      .as[(Int, Array[Double], Double, Double)].collect().sortBy(_._1)
    assert(comps.map(_._1).toSeq == comps.indices.toSeq)
    comps.foreach { case (c, w, muDot, ev) =>
      val expect = w.indices.foldLeft(0.0)((s, j) => s + mean(j) * w(j))
      assert(expect == muDot, s"comp $c mu_dot_w")
      assert(ev >= 0)
    }
  }
}
