package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.expr.VectorExpressions

/** PCA over the embedding corpus — the dimensionality-reduction /
  * whitening step embedding pipelines run before indexing (shrinks ANN
  * index footprint, decorrelates dimensions for PQ; e.g. Jégou et al.'s
  * PCA-then-PQ pipelines). Spark-first split, same as the IVF/PQ family:
  *
  *  - TRAIN on the distributed corpus in ONE aggregation pass — the
  *    d-vector sum and the d×d raw second-moment matrix are associatively
  *    partial-aggregated per partition and merged (`treeAggregate`);
  *    aggregate state is O(d²) doubles (32 KB at d=64), independent of
  *    corpus size. The eigendecomposition runs on the DRIVER over the d×d
  *    covariance (cyclic Jacobi — deterministic, no randomness), because
  *    a d×d eigenproblem is O(d³) scalar work, not a data-scale problem.
  *  - COMMIT the rotation as a parquet fixture (gen.PcaGen), the same
  *    committed-model device as the IVF quantizer: queries project
  *    against the frozen model, and DuckDB replays the projection exactly.
  *  - PROJECT as a narrow codegen-stage map ([[graft.functions.expr.PcaProject]]):
  *    `dot(x, w_c) − μ·w_c` with the centering folded into a precomputed
  *    constant so the float op ORDER is identical cross-engine.
  */
object Pca {

  /** Trained model: mean vector, eigenvalues (desc), row-major components
    * (orthonormal rows, sign-normalized so each row's largest-|w|
    * coordinate is positive — eigenvectors are defined up to sign, and an
    * unpinned sign would make the committed fixture nondeterministic).
    */
  case class PcaModel(mean: Array[Double], eigenvalues: Array[Double],
                      components: Array[Array[Double]]) {
    def muDots: Array[Double] =
      components.map(w => w.indices.foldLeft(0.0)((s, j) => s + mean(j) * w(j)))
  }

  /** One-pass distributed moments → driver-side Jacobi. `corpus` must have
    * (vec_id LONG, emb ARRAY<DOUBLE>); rows with the wrong dimension are
    * rejected (a silent skip would bias the moments).
    */
  def trainPca(corpus: DataFrame, k: Int): PcaModel = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val vecs = corpus.select(col("emb")).as[Array[Double]]
    val dim = vecs.head().length
    // Per-partition moment partials (n, sum[d], raw-second-moment upper
    // triangle [d(d+1)/2]), folded on the DRIVER in partition-index order:
    // float addition is order-dependent, and a treeAggregate's combine
    // order varies run to run — this keeps retraining bit-reproducible,
    // the determinism contract the committed fixture (gen.PcaGen) pins.
    // Partial state is O(d²) per partition; the driver fold is O(P·d²).
    val partials = vecs.rdd.mapPartitionsWithIndex { (pid, it) =>
      var n0 = 0L
      val s0 = new Array[Double](dim)
      val g0 = new Array[Double](dim * (dim + 1) / 2)
      it.foreach { x =>
        require(x.length == dim, s"embedding dim ${x.length} != $dim")
        var j = 0
        while (j < dim) {
          s0(j) += x(j)
          var i = 0
          val base = j * (j + 1) / 2
          while (i <= j) { g0(base + i) += x(i) * x(j); i += 1 }
          j += 1
        }
        n0 += 1
      }
      Iterator.single((pid, n0, s0, g0))
    }.collect().sortBy(_._1)
    var n = 0L
    val s = new Array[Double](dim)
    val g = new Array[Double](dim * (dim + 1) / 2)
    partials.foreach { case (_, n0, s0, g0) =>
      n += n0
      var j = 0
      while (j < dim) { s(j) += s0(j); j += 1 }
      var t = 0
      while (t < g.length) { g(t) += g0(t); t += 1 }
    }
    require(n > 1, "PCA needs at least two vectors")
    val mean = s.map(_ / n)
    // covariance C = G/n − μμᵀ (population form; the fixture pins scale)
    val cov = Array.ofDim[Double](dim, dim)
    var j = 0
    while (j < dim) {
      var i = 0
      val base = j * (j + 1) / 2
      while (i <= j) {
        val c = g(base + i) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        i += 1
      }
      j += 1
    }
    val (vals, vecsM) = jacobiEigen(cov)
    val order = vals.indices.sortBy(i => (-vals(i), i)).take(k)
    val comps = order.map { i =>
      val w = Array.tabulate(dim)(r => vecsM(r)(i))
      // sign pin: largest-|w| coordinate positive (first index on ties)
      val pivot = w.indices.maxBy(j => (math.abs(w(j)), -j))
      if (w(pivot) < 0) w.map(-_) else w
    }.toArray
    PcaModel(mean, order.map(vals).toArray, comps)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: sweeps of
    * (p,q) rotations until the off-diagonal mass is below tolerance.
    * Deterministic (fixed sweep order, no pivot search), O(d³) per sweep —
    * driver-side work on a d×d matrix, never data-scale. Returns
    * (eigenvalues, column-eigenvector matrix V with A·V = V·diag(λ)).
    */
  private[graft] def jacobiEigen(aIn: Array[Array[Double]],
                                     maxSweeps: Int = 64,
                                     tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val d = aIn.length
    val a = Array.tabulate(d, d)((i, j) => aIn(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val scale = math.max(1e-300, aIn.map(_.map(math.abs).max).max)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < maxSweeps && off > tol * scale) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          off = math.max(off, math.abs(apq))
          if (math.abs(apq) > tol * scale * 1e-3) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case sg  => sg / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val sI = t * c
            var r = 0
            while (r < d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - sI * arq
              a(r)(q) = sI * arp + c * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - sI * aqr
              a(q)(r) = sI * apr + c * aqr
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - sI * vrq
              v(r)(q) = sI * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** ANN through the PCA bottleneck — what the rotation is FOR: stage-1
    * candidate generation scores cosines in the k-dim reduced space (k/d
    * of the flops and bytes per pair — at production scale the reduced
    * vectors are the only thing the candidate pass touches), stage-2
    * re-ranks only the `refine` short-listed candidates per query with the
    * full-precision cosine — the same candidates-then-refine split as
    * IVF-PQ's ADC + re-rank. Both stages use the (cos DESC, vec_id) total
    * order on round-6 scores, so given the committed rotation DuckDB
    * replays candidate sets and final ranks exactly.
    */
  def annPcaTopK(spark: SparkSession, embeddings: DataFrame,
                 fixturePath: String, nQueries: Int = 10, refine: Int = 20,
                 k: Int = 5): DataFrame = {
    import spark.implicits._
    val comps = spark.read.parquet(s"$fixturePath/components")
      .select(col("comp"), col("w"), col("mu_dot_w"))
      .as[(Int, Array[Double], Double)].collect().sortBy(_._1)
    val proj = embeddings.select(col("vec_id"), col("emb"),
      VectorExpressions.pcaProject(col("emb"), comps.map(_._2),
        comps.map(_._3)).as("p"))
    val queries = proj.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("p").as("q_p"),
        col("emb").as("q_emb"))
    val scoredReduced = proj.select(col("vec_id"), col("p"))
      .crossJoin(broadcast(queries.select(col("q_id"), col("q_p"))))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(graft.functions.SimFns.cosine(col("p"), col("q_p")), 6).as("cos"))
    val cands = Ann.topKPerQuery(scoredReduced, refine)
      .select(col("q_id"), col("vec_id"))
    // full-precision re-rank of refine·nQueries rows: the candidate list is
    // O(refine·queries) — broadcast side — and full vectors are touched
    // only for the short list (the disk-resident-vectors shape)
    val rescored = broadcast(cands)
      .join(embeddings.select(col("vec_id"), col("emb")), "vec_id")
      .join(broadcast(queries.select(col("q_id"), col("q_emb"))), "q_id")
      .select(col("q_id"), col("vec_id"),
        round(graft.functions.SimFns.cosine(col("emb"), col("q_emb")), 6).as("cos"))
    Ann.topKPerQuery(rescored, k)
  }

  /** Load the committed REDUCED-SPACE coarse quantizer (gen.PcaGen layout:
    * `centroids_reduced` with c_id / c_p) — k-dim centroids trained on the
    * PCA-projected corpus, driver-held (nlist rows, tiny by construction).
    */
  def loadReducedCentroids(spark: SparkSession,
                           fixturePath: String): Array[(Long, Array[Double])] = {
    import spark.implicits._
    spark.read.parquet(s"$fixturePath/centroids_reduced").select("c_id", "c_p")
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
      .map { case (id, e) => (id, e.toArray) }
  }

  /** Rotation + reduced centroids loaded from the committed fixture. */
  private def loadModels(spark: SparkSession, fixturePath: String) = {
    import spark.implicits._
    val comps = spark.read.parquet(s"$fixturePath/components")
      .select(col("comp"), col("w"), col("mu_dot_w"))
      .as[(Int, Array[Double], Double)].collect().sortBy(_._1)
    (comps.map(_._2), comps.map(_._3), loadReducedCentroids(spark, fixturePath))
  }

  /** IVF with the coarse quantizer IN the PCA-reduced space — the
    * production composition of the two committed models (the Jégou et al.
    * PCA→quantizer lineage): where [[annPcaTopK]] brute-scans the reduced
    * space, this keeps IVF's bucket-pruned candidate shape, and where
    * plain IVF ([[Ann.ivfTopKWithCentroids]]) assigns/probes over d-dim
    * vectors, every quantizer-side operation here — assignment argmax,
    * probe selection, candidate cosine — runs over the k-dim projections
    * (k/d of the flops and bytes). Candidates come only from the nprobe
    * probed inverted lists, are scored with the reduced round-6 cosine,
    * and the `refine` short list per query is re-ranked with the
    * full-precision cosine — so full vectors are touched for
    * O(refine·queries) rows, never the corpus. Every stage is
    * deterministic arithmetic over the two committed fixtures, which is
    * what lets DuckDB replay assignment, probes, candidates, and final
    * ranks exactly (`ann_ivf_pca_topk`).
    */
  def ivfPcaTopK(spark: SparkSession, embeddings: DataFrame,
                 fixturePath: String, nQueries: Int = 10, refine: Int = 20,
                 k: Int = 5, nprobe: Int = 8): DataFrame = {
    val (w, muDots, cents) = loadModels(spark, fixturePath)
    val proj = embeddings.select(col("vec_id"), col("emb"),
      VectorExpressions.pcaProject(col("emb"), w, muDots).as("p"))
    val assigned = proj.select(col("vec_id"), col("p"),
      VectorExpressions.nearestCentroid(col("p"), cents.map(_._1),
        cents.map(_._2)).as("bucket"))
    val queries = proj.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("p").as("q_p"),
        col("emb").as("q_emb"))
    rerankReducedCandidates(
      reducedBucketCandidates(assigned, queries, cents, nprobe, refine),
      embeddings, queries, k)
  }

  /** Probe the reduced quantizer, score probed-bucket candidates with the
    * reduced cosine, shortlist `refine` per query. `assigned` carries
    * (vec_id, p, bucket); `queries` (q_id, q_p, ...).
    */
  private def reducedBucketCandidates(assigned: DataFrame, queries: DataFrame,
                                      cents: Array[(Long, Array[Double])],
                                      nprobe: Int, refine: Int): DataFrame = {
    val probes = Ann.probesFor(
        queries.select(col("q_id"), col("q_p").as("q_emb")), cents, nprobe)
      .select(col("q_id"), col("q_emb").as("q_p"), col("bucket"))
    val scoredReduced = assigned.join(broadcast(probes), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(graft.functions.SimFns.cosine(col("p"), col("q_p")), 6).as("cos"))
    Ann.topKPerQuery(scoredReduced, refine).select(col("q_id"), col("vec_id"))
  }

  /** Full-precision re-rank of the candidate short list (the
    * disk-resident-vectors shape shared with [[annPcaTopK]]): candidates
    * are O(refine·queries) — broadcast side — and full vectors are joined
    * in for the short list only.
    */
  private def rerankReducedCandidates(cands: DataFrame, corpus: DataFrame,
                                      queries: DataFrame, k: Int): DataFrame = {
    val rescored = broadcast(cands)
      .join(corpus.select(col("vec_id"), col("emb")), "vec_id")
      .join(broadcast(queries.select(col("q_id"), col("q_emb"))), "q_id")
      .select(col("q_id"), col("vec_id"),
        round(graft.functions.SimFns.cosine(col("emb"), col("q_emb")), 6).as("cos"))
    Ann.topKPerQuery(rescored, k)
  }

  /** Persist the reduced-space IVF index: postings carry ONLY
    * `(vec_id, p)` — the k-dim projections, k/d of the bytes of a
    * full-precision posting list — partitioned one directory per inverted
    * list ([[Ann.buildIvfIndex]]'s layout). Full vectors stay in the
    * source table and are read only for the re-rank short list.
    */
  def buildIvfIndexPca(embeddings: DataFrame, path: String,
                       fixturePath: String): Unit = {
    val spark = embeddings.sparkSession
    val (w, muDots, cents) = loadModels(spark, fixturePath)
    embeddings.select(col("vec_id"),
        VectorExpressions.pcaProject(col("emb"), w, muDots).as("p"))
      .select(col("vec_id"), col("p"),
        VectorExpressions.nearestCentroid(col("p"), cents.map(_._1),
          cents.map(_._2)).as("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/postings")
  }

  /** Query a persisted reduced-space IVF index: the postings scan is
    * filtered to the probed bucket ids — a partition-column `IN` list, so
    * unprobed inverted lists are pruned at planning time and never read
    * (same contract as [[Ann.ivfTopKFromIndex]], at k/d the bytes per
    * posting). `queries`/`corpus` carry `(vec_id, emb)` full-precision;
    * `corpus` is touched only for the re-rank short list.
    */
  def ivfPcaTopKFromIndex(spark: SparkSession, path: String,
                          fixturePath: String, queries: DataFrame,
                          corpus: DataFrame, k: Int = 5, refine: Int = 20,
                          nprobe: Int = 8): DataFrame = {
    val (w, muDots, cents) = loadModels(spark, fixturePath)
    val q = queries.select(col("vec_id").as("q_id"),
      col("emb").as("q_emb"),
      VectorExpressions.pcaProject(col("emb"), w, muDots).as("q_p"))
    val probes = Ann.probesFor(
        q.select(col("q_id"), col("q_p").as("q_emb")), cents, nprobe)
      .select(col("q_id"), col("q_emb").as("q_p"), col("bucket"))
    val probedBuckets = probes.select("bucket").distinct()
      .collect().map(_.getLong(0)) // nQueries × nprobe ids — driver-tiny
    val postings = spark.read.parquet(s"$path/postings")
      .filter(col("bucket").isin(probedBuckets.toSeq: _*))
    val scoredReduced = postings.join(broadcast(probes), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(graft.functions.SimFns.cosine(col("p"), col("q_p")), 6).as("cos"))
    val cands = Ann.topKPerQuery(scoredReduced, refine)
      .select(col("q_id"), col("vec_id"))
    rerankReducedCandidates(cands, corpus, q, k)
  }

  /** Load the committed REDUCED-SPACE PQ codebooks (gen.PcaGen layout:
    * `codebooks_reduced` with sub / code / cw — m subspaces over the
    * k-dim projections, dsub = k/m doubles per codeword).
    */
  def loadReducedCodebooks(spark: SparkSession,
                           fixturePath: String): Ann.PqModel = {
    import spark.implicits._
    val rows = spark.read.parquet(s"$fixturePath/codebooks_reduced")
      .select("sub", "code", "cw")
      .as[(Int, Int, Seq[Double])].collect()
    Ann.PqModel(rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rs) => rs.sortBy(_._2).map(_._3.toArray).toArray }
      .toArray)
  }

  /** Persist the IVF-PQ index with EVERY quantizer stage in the
    * PCA-reduced space — the final composition of the committed-model
    * family (Jégou et al.'s "PCA then product-quantize" lineage, the
    * layout FAISS calls `PCARx,IVFy,PQz`): postings carry only
    * `(vec_id, codes)` where codes are the m reduced-subspace codewords —
    * m bytes-scale per vector vs k doubles for [[buildIvfIndexPca]] and
    * d doubles for [[Ann.buildIvfIndex]] — partitioned one directory per
    * reduced-space inverted list. Full vectors stay in the source table
    * for the re-rank short list; at 100 TB the scan structure is ~0.5%
    * of the raw corpus.
    */
  def buildIvfPqIndexPca(embeddings: DataFrame, path: String,
                         fixturePath: String): Unit = {
    val spark = embeddings.sparkSession
    val (w, muDots, cents) = loadModels(spark, fixturePath)
    val rpq = loadReducedCodebooks(spark, fixturePath)
    embeddings.select(col("vec_id"),
        VectorExpressions.pcaProject(col("emb"), w, muDots).as("p"))
      .select(col("vec_id"),
        VectorExpressions.nearestCentroid(col("p"), cents.map(_._1),
          cents.map(_._2)).as("bucket"),
        VectorExpressions.pqEncode(col("p"), rpq.codebooks).as("codes"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/postings")
  }

  /** Query a persisted reduced-space IVF-PQ index: probe the reduced
    * coarse quantizer, ADC-score the probed lists' CODES against the
    * reduced query's LUT (per candidate the work is m table lookups — no
    * vector arithmetic at all in the candidate join), shortlist
    * `refine·k` per query, exact full-precision cosine re-rank from the
    * corpus table. The postings scan is pruned to probed bucket ids at
    * planning time (partition-column `IN` list — unprobed inverted lists
    * are never read). Deterministic end-to-end over the two committed
    * fixtures, so DuckDB replays assignment, encode, LUT, ADC ranks, and
    * the final order exactly.
    */
  def ivfPqPcaTopKFromIndex(spark: SparkSession, path: String,
                            fixturePath: String, queries: DataFrame,
                            corpus: DataFrame, k: Int = 5, refine: Int = 20,
                            nprobe: Int = 8): DataFrame = {
    val (w, muDots, cents) = loadModels(spark, fixturePath)
    val rpq = loadReducedCodebooks(spark, fixturePath)
    val q = queries.select(col("vec_id").as("q_id"),
      col("emb").as("q_emb"),
      VectorExpressions.pcaProject(col("emb"), w, muDots).as("q_p"))
    val probes = Ann.probesFor(
        q.select(col("q_id"), col("q_p").as("q_emb")), cents, nprobe)
      .withColumn("lut",
        VectorExpressions.pqLutCosine(col("q_emb"), rpq.codebooks))
      .select(col("q_id"), col("bucket"), col("lut"))
    val probedBuckets = probes.select("bucket").distinct()
      .collect().map(_.getLong(0)) // nQueries × nprobe ids — driver-tiny
    val postings = spark.read.parquet(s"$path/postings")
      .filter(col("bucket").isin(probedBuckets.toSeq: _*))
    val adc = postings.join(broadcast(probes), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        VectorExpressions.pqAdcCosine(col("codes"), col("lut"),
          rpq.cwNorms2Flat, rpq.ksub).as("cos"))
    val shortList = Ann.topKPerQuery(adc, refine * k)
      .select(col("q_id"), col("vec_id"))
    rerankReducedCandidates(shortList, corpus,
      q.select(col("q_id"), col("q_emb")), k)
  }

  /** Load the committed rotation (gen.PcaGen layout: `components` with
    * comp / w / mu_dot_w / eigenvalue) and project the embedding table —
    * output long-form (vec_id, comp, proj) with proj rounded at 6 (the
    * ANN-family edge-rounding convention). The model is O(k·d) in the
    * closure; the projection is one narrow map stage.
    */
  def projectFromFixture(spark: SparkSession, embeddings: DataFrame,
                         fixturePath: String): DataFrame = {
    import spark.implicits._
    val comps = spark.read.parquet(s"$fixturePath/components")
      .select(col("comp"), col("w"), col("mu_dot_w"))
      .as[(Int, Array[Double], Double)].collect().sortBy(_._1)
    val w = comps.map(_._2)
    val muDots = comps.map(_._3)
    embeddings
      .select(col("vec_id"),
        VectorExpressions.pcaProject(col("emb"), w, muDots).as("p"))
      .select(col("vec_id"), posexplode(col("p")).as(Seq("comp", "proj")))
      .select(col("vec_id"), col("comp").cast("int").as("comp"),
        round(col("proj"), 6).as("proj"))
  }
}
