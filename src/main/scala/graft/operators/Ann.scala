package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.SimFns

/** Approximate-nearest-neighbor search over an embedding column
  * (BASELINE.json north_star). Two paths:
  *
  *  - [[bruteTopK]] — exact baseline: broadcast the (small) query set, one
  *    streaming pass over the corpus, per-query top-k via ranking window.
  *    At 100 TB the corpus side never shuffles for the scoring pass; the
  *    only shuffle is the final top-k on the (tiny) query key.
  *  - [[ivfTopK]] — IVF scale path: k-means centroids (stride-sample init +
  *    Lloyd iterations), corpus bucketed by nearest centroid via a narrow
  *    per-row argmax (zero shuffle), queries probe only `nprobe` buckets,
  *    cutting scored candidates by ~C/nprobe.
  *
  * Ranking is on `round(cos, 6)` with vec_id tiebreak — totally ordered, so
  * results are stable across engines and partitionings.
  */
object Ann {

  private[graft] def emb(df: DataFrame) =
    df.select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))

  /** Per-query top-k over a `(q_id, vec_id, cos)` scored set via the
    * bounded [[graft.functions.TopKByScore]] aggregate: map-side k-entry
    * heaps merge through a normal partial/final aggregation, so the
    * shuffle carries ≤ k rows per (query × partition) — a ranking window
    * here would shuffle and sort the ENTIRE scored set per query.
    */
  private[graft] def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    // cosine is null for zero-norm/mismatched vectors and would NPE in the
    // non-nullable Double encoder; NaN would rank arbitrarily. Both mean
    // "no defined similarity" — never in any top-k (the oracle's DESC sort
    // puts its nulls last likewise).
    scored.select(col("q_id"), col("vec_id"), col("cos"))
      .filter(col("cos").isNotNull && !isnan(col("cos")))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .agg(new graft.functions.TopKByScore(k).toColumn.name("topk"))
      .toDF("q_id", "topk")
      .select(col("q_id"), posexplode(col("topk")).as(Seq("pos", "e")))
      .select(col("q_id"), col("e.id").as("vec_id"), col("e.score").as("cos"),
        (col("pos") + 1).cast("int").as("rk"))
  }

  /** Exact brute-force cosine top-k for queries `vec_id < nQueries`. */
  def bruteTopK(embeddings: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val corpus = emb(embeddings)
    val queries = corpus.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(SimFns.cosine(col("emb"), col("q_emb")), 6).as("cos"))
    topKPerQuery(scored, k)
  }

  /** Hard-negative mining for contrastive training pairs: per anchor
    * (`vec_id < nAnchors`), the k most-cosine-similar vectors whose
    * LABEL differs — near in embedding space, wrong class, exactly the
    * negatives a contrastive loss learns the most from (the in-batch-
    * random alternative mostly yields easy, uninformative negatives).
    *
    * Exact baseline, same shape as [[bruteTopK]] with the label
    * predicate fused into the scoring scan: the anchor table broadcasts
    * (bounded by nAnchors), the corpus streams once, and the k-bounded
    * [[topKPerQuery]] aggregate keeps the shuffle at ≤ k rows per
    * (anchor × partition). The 100-TB path swaps the corpus stream for
    * the persisted IVF index probe (assign anchors to buckets, score
    * probed postings only) with the same label filter on the candidate
    * set — candidates carry their label through the postings, so the
    * composition is a one-line predicate, not a new operator.
    */
  def hardNegatives(embeddings: DataFrame, nAnchors: Int, k: Int): DataFrame = {
    val corpus = embeddings.select(col("vec_id"),
      col("embedding").cast("array<double>").as("emb"), col("label"))
    val anchors = corpus.filter(col("vec_id") < nAnchors)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"),
        col("label").as("q_label"))
    val scored = corpus.crossJoin(broadcast(anchors))
      .filter(col("vec_id") =!= col("q_id") &&
        col("label") =!= col("q_label"))
      .select(col("q_id"), col("vec_id"),
        round(SimFns.cosine(col("emb"), col("q_emb")), 6).as("cos"))
    topKPerQuery(scored, k)
  }

  /** IVF index build + probe. Centroids are seeded k-means++ style from a
    * deterministic driver-held candidate pool and refined with `lloydIters`
    * k-means (Lloyd) iterations; every vector is then assigned to its
    * nearest centroid and queries probe the `nprobe` nearest buckets.
    * Returns the same schema as [[bruteTopK]].
    *
    * Scale shape — no corpus-wide shuffle anywhere:
    *  - Assignment is a narrow projection: the per-row argmax runs inside the
    *    codegen'd scan via [[graft.functions.expr.NearestCentroid]] with the
    *    (tiny, driver-held) centroid table riding in the task closure. The
    *    earlier crossJoin+groupBy form re-shuffled the whole corpus with its
    *    embedding payloads once per index build.
    *  - The Lloyd update step is relational: posexplode → hash-aggregate on
    *    the uniform (bucket, pos) key — the exchange carries C×dim mean
    *    cells, not vectors — then C rows collect back into the model.
    *    Fixed-point means keep the centroids partition-order invariant.
    *  - Probing broadcasts `nQueries × nprobe` rows into a hash join against
    *    the assigned corpus; scoring streams map-side into the k-bounded
    *    [[topKPerQuery]] aggregate.
    *
    * Centroid collects are the k-means model update, not a distributed-data
    * collect: C ≈ numCentroids rows per iteration, bounded by construction.
    * Empty buckets keep their previous centroid.
    */
  /** Deterministic driver-side parallelism for the pool-training hot
    * loops (seeding distance updates, per-round argmin assignment): each
    * index writes only its own slot, so thread interleaving cannot change
    * the result — unlike a parallel SUM, whose fp addition order would
    * make centroids run-dependent. Sums stay sequential for that reason.
    * At production nlist (C≈1024, pool≈64·C) these loops are ~4G flops per
    * round and dominate training wall-time single-threaded.
    */
  private def parSlots(n: Int)(f: Int => Unit): Unit =
    java.util.stream.IntStream.range(0, n).parallel().forEach(i => f(i))

  /** Angular distance `1 - cos(a, b)` for the driver-side seeding step;
    * zero-norm / length-mismatched vectors are maximally far (they cannot
    * anchor a cosine bucket).
    */
  private def angDist(a: Array[Double], b: Array[Double]): Double = {
    if (a.length != b.length) return 2.0
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 2.0 else 1.0 - dot / denom
  }

  /** k-means++ init, pool-side Lloyd to a fixpoint, then `lloydIters`
    * distributed Lloyd iterations over `corpus` (`(vec_id, emb)`) — the
    * shared centroid-training step of [[ivfTopK]] and [[buildIvfIndex]].
    *
    * `numCentroids` is the IVF inverted-list count (FAISS calls it nlist):
    * pinned by the caller, NOT derived from corpus size — C must track the
    * data's natural cluster count (the fixture's is fixed at 10 labels), so
    * growing C with n over-partitions and collapses recall at small nprobe
    * (measured: recall@5 0.22-0.54 at sf0.1 with stride-derived C=42-86).
    *
    * Seeding is classic k-means++ (D²-weighted with angular distance,
    * seeded RNG → deterministic) over a driver-held candidate pool: a
    * vec_id-stride sample of ~64 candidates per requested centroid, bounded
    * regardless of corpus size. ++-seeding spreads the seeds across the
    * data's natural clusters where uniform stride init could drop whole
    * clusters; on THIS fixture the `IvfSweep` measurement shows recall
    * tracks probe coverage (nprobe/C) almost linearly regardless of init —
    * the synthetic embeddings' top-5 neighbors are only weakly clustered —
    * so the pinned defaults buy recall with nprobe (8/10 lists → 0.92-0.96
    * measured at both sf0.001 and sf0.1). A corpus with real cluster
    * structure gets recall ≫ coverage at small nprobe; the other lever is
    * multi-assignment (`spill` — see [[assignBucketsSpill]]): measured,
    * spill=2 / nprobe=5 reaches 0.94-1.00. On this fixture recall tracks
    * SCANNED VOLUME (spill × nprobe / C) however it is sliced — the
    * coverage story again; spill's real payoff is at production nlist
    * (C in the thousands, nprobe ≪ C), where doubling a 1-2% scanned
    * fraction is cheap and boundary-vector loss, not coverage, is what
    * caps recall (see `IvfSweep`).
    */
  private[graft] def trainCentroids(corpus: DataFrame, numCentroids: Int,
                             lloydIters: Int): Array[(Long, Array[Double])] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // the training loop re-reads the corpus for the count, the pool-sample
    // pass, and once per Lloyd iteration — cache it for the loop's
    // lifetime so every pass after the first reads executor memory, not
    // parquet; released before return (the caller's post-training
    // assignment pass is a single scan and must not pin the corpus for the
    // query's lifetime)
    corpus.persist()
    try {
      val n = corpus.count()
      val poolTarget = math.min(n, math.max(numCentroids.toLong * 64, 512L))
      val stride = math.max(1L, n / math.max(1L, poolTarget))
      val pool = corpus
        .filter(col("vec_id") % stride === 0)
        .as[(Long, Array[Double])].collect().sortBy(_._1).map(_._2)
      require(pool.nonEmpty, "IVF training needs a non-empty corpus")
      val rnd = new scala.util.Random(13L)
      val chosen = scala.collection.mutable.ArrayBuffer(pool(rnd.nextInt(pool.length)))
      val d2 = pool.map(p => { val d = angDist(p, chosen.head); d * d })
      var exhausted = false
      while (!exhausted && chosen.size < math.min(numCentroids, pool.length)) {
        val total = d2.sum
        if (total <= 0) {
          // every remaining candidate is at distance 0 from a chosen
          // centroid (pool dominated by duplicate vectors): more seeds
          // would be copies — dead inverted lists. Stop at the distinct
          // candidate count; Lloyd below works with the fewer seeds.
          exhausted = true
        } else {
          var r = rnd.nextDouble() * total
          var pick = 0
          while (pick < pool.length - 1 && r >= d2(pick)) { r -= d2(pick); pick += 1 }
          val c = pool(pick)
          chosen += c
          parSlots(pool.length) { i =>
            val d = angDist(pool(i), c)
            if (d * d < d2(i)) d2(i) = d * d
          }
        }
      }
      // Lloyd-refine ON THE POOL to a fixpoint first (driver-side, no Spark
      // jobs): each DISTRIBUTED Lloyd iteration below is a full-corpus
      // pass — the dominant training cost at 100 TB — so the sample carries
      // the bulk of the refinement and the distributed iterations that
      // remain are exactness passes against the full data, not the search
      // for the optimum. Deterministic: fixed iteration order, fixed
      // 20-round cap, empty clusters keep their previous centroid.
      var poolCents = chosen.toArray
      var assign = Array.fill(pool.length)(-1)
      var stable = false
      var poolRound = 0
      while (!stable && poolRound < 20) {
        val next = new Array[Int](pool.length)
        val centsNow = poolCents
        parSlots(pool.length) { i =>
          val p = pool(i)
          var best = 0; var bestD = Double.MaxValue; var c = 0
          while (c < centsNow.length) {
            val d = angDist(p, centsNow(c))
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          next(i) = best
        }
        stable = java.util.Arrays.equals(next, assign)
        assign = next
        if (!stable) {
          val dim = poolCents.head.length
          val sums = Array.fill(poolCents.length)(new Array[Double](dim))
          val counts = new Array[Int](poolCents.length)
          var i = 0
          while (i < pool.length) {
            val c = assign(i); val v = pool(i)
            if (v.length == dim) {
              var j = 0
              while (j < dim) { sums(c)(j) += v(j); j += 1 }
              counts(c) += 1
            }
            i += 1
          }
          poolCents = poolCents.zipWithIndex.map { case (old, c) =>
            if (counts(c) == 0) old
            else { val m = sums(c); var j = 0; while (j < dim) { m(j) /= counts(c); j += 1 }; m }
          }
        }
        poolRound += 1
      }
      var cents: Array[(Long, Array[Double])] =
        poolCents.zipWithIndex.map { case (e, i) => (i.toLong, e) }.toArray
      for (_ <- 1 to lloydIters) {
        val means = assignBuckets(corpus, cents)
          .select(col("bucket"), posexplode(col("emb")).as(Seq("pos", "x")))
          .groupBy(col("bucket"), col("pos"))
          .agg(graft.functions.FxMath.scaledAvg(
            sum(round(col("x") * 1000000).cast("long")),
            count(lit(1)), 1000000L, 6).as("v"))
          .groupBy(col("bucket"))
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("v")))),
            e => e.getField("v")).as("centroid"))
          .as[(Long, Array[Double])].collect().toMap
        cents = cents.map { case (id, old) => (id, means.getOrElse(id, old)) }
      }
      cents
    } finally {
      corpus.unpersist()
    }
  }

  private def assignBuckets(df: DataFrame,
                            cents: Array[(Long, Array[Double])]): DataFrame =
    df.withColumn("bucket", graft.functions.expr.VectorExpressions
      .nearestCentroid(col("emb"), cents.map(_._1), cents.map(_._2)))

  /** Multi-assignment ("spill"): each vector lands in its `spill` nearest
    * inverted lists — the standard IVF lever for boundary-vector recall,
    * trading spill× index rows (still a narrow per-row projection, zero
    * shuffle) for recall at SMALL nprobe. `spill = 1` is exactly
    * [[assignBuckets]].
    */
  private[graft] def assignBucketsSpill(df: DataFrame,
                                 cents: Array[(Long, Array[Double])],
                                 spill: Int): DataFrame =
    if (spill <= 1) assignBuckets(df, cents)
    else df.withColumn("bucket", explode(graft.functions.expr.VectorExpressions
      .nearestCentroids(col("emb"), cents.map(_._1), cents.map(_._2), spill)))

  /** Per-query nprobe nearest buckets against the driver-held centroid
    * table (query set is tiny — HOF cost immaterial). `queries` must carry
    * `(q_id, q_emb)`.
    */
  private[graft] def probesFor(queries: DataFrame,
                        cents: Array[(Long, Array[Double])],
                        nprobe: Int): DataFrame = {
    val centLit = typedLit(cents.map { case (id, e) => (id, e.toSeq) }.toSeq)
    queries.select(col("q_id"), col("q_emb"),
        explode(slice(array_sort(transform(centLit, c =>
          struct((-round(SimFns.cosine(col("q_emb"), c.getField("_2")), 6)).as("neg_cos"),
            c.getField("_1").as("c_id")))), 1, nprobe)).as("p"))
      .select(col("q_id"), col("q_emb"), col("p.c_id").as("bucket"))
  }

  /** `dedupe` must be true when the corpus side was spill-assigned: a
    * vector sharing ≥2 probed buckets with a query would otherwise be
    * scored twice and could occupy two of its top-k slots. distinct() on
    * (q_id, vec_id, cos) is exact — cos is a function of the pair.
    */
  private[graft] def scoreAndTopK(assigned: DataFrame, probes: DataFrame,
                           k: Int, dedupe: Boolean = false): DataFrame = {
    val joined = assigned.join(broadcast(probes), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(SimFns.cosine(col("emb"), col("q_emb")), 6).as("cos"))
    topKPerQuery(if (dedupe) joined.distinct() else joined, k)
  }

  def ivfTopK(embeddings: DataFrame, nQueries: Int, k: Int,
              numCentroids: Int = 10, nprobe: Int = 8,
              lloydIters: Int = 4, spill: Int = 1): DataFrame = {
    val corpus = emb(embeddings)
    val cents = trainCentroids(corpus, numCentroids, lloydIters)
    ivfTopKWithCentroids(embeddings, cents, nQueries, k, nprobe, spill)
  }

  /** IVF top-k against a PRE-TRAINED coarse quantizer — the production
    * split: the quantizer is trained once on a bounded sample (committed
    * as a fixture here — see gen.AnnIndexGen) and reused across the
    * corpus. Given fixed centroids every step (assignment argmax, probe
    * selection, candidate join, ranked re-score) is deterministic
    * arithmetic, which is what makes this path exactly oracle-able.
    */
  def ivfTopKWithCentroids(embeddings: DataFrame,
                           cents: Array[(Long, Array[Double])],
                           nQueries: Int, k: Int, nprobe: Int = 8,
                           spill: Int = 1): DataFrame = {
    val corpus = emb(embeddings)
    val queries = corpus.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    scoreAndTopK(assignBucketsSpill(corpus, cents, spill),
      probesFor(queries, cents, nprobe), k, dedupe = spill > 1)
  }

  /** Load a centroid table written by [[buildIvfIndex]] / gen.AnnIndexGen:
    * `(c_id, c_emb)`, driver-held (numCentroids rows — tiny by
    * construction).
    */
  def loadCentroids(spark: org.apache.spark.sql.SparkSession,
                    path: String): Array[(Long, Array[Double])] = {
    import spark.implicits._
    spark.read.parquet(s"$path/centroids").select("c_id", "c_emb")
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
      .map { case (id, e) => (id, e.toArray) }
  }

  /** Load PQ codebooks written by [[buildIvfPqIndex]] / gen.AnnIndexGen. */
  def loadCodebooks(spark: org.apache.spark.sql.SparkSession,
                    path: String): PqModel = {
    import spark.implicits._
    val rows = spark.read.parquet(s"$path/codebooks")
      .select("sub", "code", "cw")
      .as[(Int, Int, Seq[Double])].collect()
    PqModel(rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rs) => rs.sortBy(_._2).map(_._3.toArray).toArray }
      .toArray)
  }

  /** Persist the IVF index: the assigned corpus lands `partitionBy(bucket)`
    * (one directory per inverted list) beside the trained centroid table.
    * Build once, probe many — the real-system shape: at query time only the
    * probed buckets' partitions are ever READ (Catalyst partition pruning),
    * so per-query I/O is O(nprobe/C of the corpus), not a full scan.
    */
  def buildIvfIndex(embeddings: DataFrame, path: String,
                    numCentroids: Int = 10, lloydIters: Int = 4,
                    spill: Int = 1): Unit = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val corpus = emb(embeddings)
    val cents = trainCentroids(corpus, numCentroids, lloydIters)
    assignBucketsSpill(corpus, cents, spill)
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/postings")
    // spill rides in the centroid table so the query side knows whether
    // postings contain replicas (scored candidates then need dedup)
    cents.toSeq.map { case (id, e) => (id, e.toSeq, spill) }
      .toDF("c_id", "c_emb", "spill")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** [[buildIvfIndex]] with a PRE-TRAINED quantizer instead of training
    * one — the other half of the re-index lifecycle: the SCHEDULE
    * retrains centroids, builds and [[appendToIvfIndex]] admissions reuse
    * them, so a rebuild against an unchanged quantizer is bit-identical
    * to the incremental path it replaces (what makes the incremental
    * index exactly oracle-able, not just recall-gated).
    */
  def buildIvfIndexWithCentroids(embeddings: DataFrame, path: String,
                                 cents: Array[(Long, Array[Double])],
                                 spill: Int = 1): Unit = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    assignBucketsSpill(emb(embeddings), cents, spill)
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/postings")
    cents.toSeq.map { case (id, e) => (id, e.toSeq, spill) }
      .toDF("c_id", "c_emb", "spill")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** ADMIT a batch into a persisted IVF index — the index lifecycle's
    * other half (the [[graft.operators.DedupIndex.appendToIndex]] shape
    * for vectors): new vectors are assigned with the index's OWN committed
    * quantizer (including its recorded spill factor — an append must not
    * change the replication discipline queries assume) and their postings
    * APPEND into the existing bucket-partitioned layout. Per-batch cost is
    * one narrow assignment pass + one append write, O(batch), never a
    * rebuild; the quantizer is deliberately NOT retrained — production
    * IVF re-trains on a schedule, not per admission, so recall on drifted
    * data is a re-index decision, not a side effect.
    */
  def appendToIvfIndex(embeddings: DataFrame, path: String): Unit = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val centTable = spark.read.parquet(s"$path/centroids")
    val centRows =
      (if (centTable.columns.contains("spill")) centTable
       else centTable.withColumn("spill", lit(1)))
        .select("c_id", "c_emb", "spill")
        .as[(Long, Seq[Double], Int)].collect().sortBy(_._1)
    val cents = centRows.map { case (id, e, _) => (id, e.toArray) }
    val spill = centRows.headOption.map(_._3).getOrElse(1)
    assignBucketsSpill(emb(embeddings), cents, spill)
      .write.mode("append").partitionBy("bucket").parquet(s"$path/postings")
  }

  /** Query a persisted IVF index. `queries` carries `(vec_id, embedding)`;
    * same output schema as [[bruteTopK]]. The postings scan is filtered to
    * the probed bucket ids — a partition-column `IN` list, so unprobed
    * inverted lists are pruned at planning time and never read.
    */
  def ivfTopKFromIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                       queries: DataFrame, k: Int, nprobe: Int = 8): DataFrame = {
    import spark.implicits._
    // index-format tolerance: v1 centroid tables (pre-spill) carry only
    // (c_id, c_emb); a missing spill column means unreplicated postings,
    // so default 1 instead of failing the read on the schema mismatch
    val centTable = spark.read.parquet(s"$path/centroids")
    val centRows =
      (if (centTable.columns.contains("spill")) centTable
       else centTable.withColumn("spill", lit(1)))
        .select("c_id", "c_emb", "spill")
        .as[(Long, Seq[Double], Int)].collect().sortBy(_._1)
    val cents = centRows.map { case (id, e, _) => (id, e.toArray) }
    val spill = centRows.headOption.map(_._3).getOrElse(1)
    val probes = probesFor(
      emb(queries).select(col("vec_id").as("q_id"), col("emb").as("q_emb")),
      cents, nprobe)
    val probedBuckets = probes.select("bucket").distinct()
      .collect().map(_.getLong(0)) // nQueries × nprobe ids — driver-tiny
    val postings = spark.read.parquet(s"$path/postings")
      .filter(col("bucket").isin(probedBuckets.toSeq: _*))
    scoreAndTopK(postings, probes, k, dedupe = spill > 1)
  }

  /** Product-quantization model (Jégou et al., TPAMI 2011):
    * `codebooks(sub)(code)` is the L2 codeword for contiguous subspace
    * `sub`. At `m = 8` over dim-64 doubles, an encoded vector is 8 small
    * ints vs 512 bytes — the compression that makes a 100-TB embedding
    * corpus's scan structure ~1-2% of the raw data, with full-precision
    * vectors kept on disk only for the final re-rank of a per-query short
    * list.
    */
  final case class PqModel(codebooks: Array[Array[Array[Double]]]) {
    val m: Int = codebooks.length
    val dsub: Int = codebooks(0)(0).length
    val ksub: Int = codebooks.map(_.length).max
    /** Flat `[sub·ksub + code]` squared codeword norms for ADC. */
    lazy val cwNorms2Flat: Array[Double] = {
      val out = new Array[Double](m * ksub)
      for (sub <- 0 until m; c <- codebooks(sub).indices) {
        val cw = codebooks(sub)(c)
        var s = 0.0; var j = 0
        while (j < cw.length) { s += cw(j) * cw(j); j += 1 }
        out(sub * ksub + c) = s
      }
      out
    }
  }

  /** Squared Euclidean distance for subspace codebook training (PQ trains
    * L2 per subspace; cosine enters only at ADC scoring time).
    */
  private def l2sq(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Driver-side seeded k-means (++ init, Lloyd to fixpoint, 25-round cap,
    * empty clusters keep their centroid) — deterministic; the slot-parallel
    * loops follow the [[parSlots]] discipline (no parallel fp sums).
    */
  private def kmeansL2(pool: Array[Array[Double]], k: Int,
                       rnd: scala.util.Random): Array[Array[Double]] = {
    val chosen = scala.collection.mutable.ArrayBuffer(pool(rnd.nextInt(pool.length)))
    val d2 = pool.map(p => l2sq(p, chosen.head))
    var exhausted = false
    while (!exhausted && chosen.size < math.min(k, pool.length)) {
      val total = d2.sum
      if (total <= 0) exhausted = true // only duplicate candidates remain
      else {
        var r = rnd.nextDouble() * total
        var pick = 0
        while (pick < pool.length - 1 && r >= d2(pick)) { r -= d2(pick); pick += 1 }
        val c = pool(pick)
        chosen += c
        parSlots(pool.length) { i =>
          val d = l2sq(pool(i), c)
          if (d < d2(i)) d2(i) = d
        }
      }
    }
    var cents = chosen.toArray
    var assign = Array.fill(pool.length)(-1)
    var stable = false
    var round = 0
    while (!stable && round < 25) {
      val next = new Array[Int](pool.length)
      val cn = cents
      parSlots(pool.length) { i =>
        var best = 0; var bd = Double.MaxValue; var c = 0
        while (c < cn.length) {
          val d = l2sq(pool(i), cn(c))
          if (d < bd) { bd = d; best = c }
          c += 1
        }
        next(i) = best
      }
      stable = java.util.Arrays.equals(next, assign)
      assign = next
      if (!stable) {
        val dsub = cents.head.length
        val sums = Array.fill(cents.length)(new Array[Double](dsub))
        val counts = new Array[Int](cents.length)
        var i = 0
        while (i < pool.length) {
          val c = assign(i); val v = pool(i)
          var j = 0
          while (j < dsub) { sums(c)(j) += v(j); j += 1 }
          counts(c) += 1
          i += 1
        }
        cents = cents.zipWithIndex.map { case (old, c) =>
          if (counts(c) == 0) old
          else {
            val mn = sums(c); var j = 0
            while (j < dsub) { mn(j) /= counts(c); j += 1 }
            mn
          }
        }
      }
      round += 1
    }
    cents
  }

  /** Train PQ codebooks on a stride-sampled driver pool (same bounded-pool
    * discipline as [[trainCentroids]]: ~64 candidates per codeword,
    * independent of corpus size — production PQ likewise trains on a
    * sample). Per subspace: seeded k-means++ + Lloyd fixpoint, all
    * driver-side; encoding the corpus is then a single narrow projection.
    */
  private[graft] def trainPq(corpus: DataFrame, m: Int, ksub: Int): PqModel = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus.persist()
    try {
      val n = corpus.count()
      val poolTarget = math.min(n, math.max(ksub.toLong * 64, 512L))
      val stride = math.max(1L, n / math.max(1L, poolTarget))
      val sample = corpus.filter(col("vec_id") % stride === 0)
        .as[(Long, Array[Double])].collect().sortBy(_._1).map(_._2)
      require(sample.nonEmpty, "PQ training needs a non-empty corpus")
      val dim = sample.head.length
      require(dim % m == 0, s"embedding dim $dim must be divisible by m=$m")
      val dsub = dim / m
      val pool = sample.filter(_.length == dim)
      val codebooks = Array.tabulate(m) { sub =>
        val sv = pool.map(v =>
          java.util.Arrays.copyOfRange(v, sub * dsub, (sub + 1) * dsub))
        kmeansL2(sv, ksub, new scala.util.Random(17L + sub))
      }
      PqModel(codebooks)
    } finally corpus.unpersist()
  }

  /** IVF-PQ top-k: coarse IVF pruning (probed inverted lists only), PQ
    * asymmetric-distance scoring over CODES (the corpus's full-precision
    * vectors never enter the candidate join — per candidate the work is
    * `m` table lookups), then an exact cosine re-rank of the per-query
    * `refine·k` short list against the full vectors (a broadcast semi-join
    * back to the corpus — the disk-resident-vectors shape of a production
    * IVF-PQ system). Output schema matches [[bruteTopK]]; ranking of the
    * final list is exact cosine, so at `refine·k` ≥ the true top-k's
    * candidate coverage the result converges to [[ivfTopK]]'s.
    *
    * Deterministic end-to-end: seeded coarse + PQ training, smaller-code
    * tie-break in encode, and the exact re-rank's (round(cos,6), vec_id)
    * total order.
    *
    * Parameter guidance from the production-regime probe (`PqScaleProbe`,
    * BASELINE.md): on TIGHTLY-CLUSTERED corpora ADC error rivals the
    * between-neighbor cosine gaps, so size `m = dim/4` (dsub≈4) at
    * refine≈10 — that reaches the uncompressed-IVF recall ceiling at 32×
    * compression — or keep smaller m and spend refine (m=dim/8 needs
    * refine≈50 there). The defaults suit near-random corpora like the sf
    * fixtures, where ADC error is small relative to neighbor gaps.
    */
  def ivfPqTopK(embeddings: DataFrame, nQueries: Int, k: Int,
                numCentroids: Int = 10, nprobe: Int = 8, lloydIters: Int = 4,
                m: Int = 8, ksub: Int = 256, refine: Int = 20): DataFrame = {
    val corpus = emb(embeddings)
    val cents = trainCentroids(corpus, numCentroids, lloydIters)
    val pq = trainPq(corpus, m, ksub)
    ivfPqTopKWithModels(embeddings, cents, pq, nQueries, k, nprobe, refine)
  }

  /** IVF-PQ top-k against PRE-TRAINED coarse centroids and PQ codebooks
    * (see [[ivfTopKWithCentroids]] for why the split matters): coarse
    * pruning → ADC shortlist over codes → exact cosine re-rank, all
    * deterministic given the models.
    */
  def ivfPqTopKWithModels(embeddings: DataFrame,
                          cents: Array[(Long, Array[Double])], pq: PqModel,
                          nQueries: Int, k: Int, nprobe: Int = 8,
                          refine: Int = 20): DataFrame = {
    val corpus = emb(embeddings)
    val codes = assignBuckets(corpus, cents)
      .select(col("vec_id"), col("bucket"), graft.functions.expr
        .VectorExpressions.pqEncode(col("emb"), pq.codebooks).as("codes"))
    val queries = corpus.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val probes = probesFor(queries, cents, nprobe)
      .withColumn("lut", graft.functions.expr.VectorExpressions
        .pqLutCosine(col("q_emb"), pq.codebooks))
      .select("q_id", "bucket", "lut")
    val adc = codes.join(broadcast(probes), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), graft.functions.expr
        .VectorExpressions.pqAdcCosine(col("codes"), col("lut"),
          pq.cwNorms2Flat, pq.ksub).as("cos"))
    val shortList = topKPerQuery(adc, refine * k).select("q_id", "vec_id")
    val rescored = corpus.join(broadcast(shortList), "vec_id")
      .join(broadcast(queries), "q_id")
      .select(col("q_id"), col("vec_id"),
        round(SimFns.cosine(col("emb"), col("q_emb")), 6).as("cos"))
    topKPerQuery(rescored, k)
  }

  /** Persist the IVF-PQ index: PQ codes land `partitionBy(bucket)` (one
    * directory per inverted list — the same pruning contract as
    * [[buildIvfIndex]], but each row is `m` one-byte-scale codes instead
    * of the full vector: the on-disk scan structure is ~1-2% of the raw
    * corpus at production dims), beside the coarse centroid table and the
    * flattened PQ codebooks. Full-precision vectors are NOT in the index —
    * at query time the exact re-rank reads them from the original corpus
    * table for the short list only.
    */
  def buildIvfPqIndex(embeddings: DataFrame, path: String,
                      numCentroids: Int = 10, lloydIters: Int = 4,
                      m: Int = 8, ksub: Int = 256): Unit = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val corpus = emb(embeddings)
    val cents = trainCentroids(corpus, numCentroids, lloydIters)
    val pq = trainPq(corpus, m, ksub)
    assignBuckets(corpus, cents)
      .select(col("vec_id"), col("bucket"), graft.functions.expr
        .VectorExpressions.pqEncode(col("emb"), pq.codebooks).as("codes"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/codes")
    cents.toSeq.map { case (id, e) => (id, e.toSeq) }
      .toDF("c_id", "c_emb")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    pq.codebooks.zipWithIndex.flatMap { case (cb, sub) =>
      cb.zipWithIndex.map { case (cw, code) => (sub, code, cw.toSeq) }
    }.toSeq.toDF("sub", "code", "cw")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
  }

  /** Query a persisted IVF-PQ index. `queries` carries `(vec_id,
    * embedding)`; `corpus` is the full-precision vector table the exact
    * re-rank reads (the index itself holds only codes). The codes scan is
    * pruned to probed buckets at planning time, so per-query I/O over the
    * index is O(nprobe/C) of an already-~50×-compressed structure. Answers
    * identically to [[ivfPqTopK]] built from the same corpus (same seeds →
    * same models).
    */
  def ivfPqTopKFromIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                         queries: DataFrame, corpus: DataFrame, k: Int,
                         nprobe: Int = 8, refine: Int = 20): DataFrame = {
    import spark.implicits._
    val cents = spark.read.parquet(s"$path/centroids")
      .select("c_id", "c_emb")
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
      .map { case (id, e) => (id, e.toArray) }
    val cbRows = spark.read.parquet(s"$path/codebooks")
      .select("sub", "code", "cw")
      .as[(Int, Int, Seq[Double])].collect()
    val codebooks = cbRows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rows) => rows.sortBy(_._2).map(_._3.toArray).toArray }
      .toArray
    val pq = PqModel(codebooks)
    val q = emb(queries).select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val probes = probesFor(q, cents, nprobe)
      .withColumn("lut", graft.functions.expr.VectorExpressions
        .pqLutCosine(col("q_emb"), pq.codebooks))
      .select("q_id", "bucket", "lut")
    val probedBuckets = probes.select("bucket").distinct()
      .collect().map(_.getLong(0)) // nQueries × nprobe ids — driver-tiny
    val codes = spark.read.parquet(s"$path/codes")
      .filter(col("bucket").isin(probedBuckets.toSeq: _*))
    val adc = codes.join(broadcast(probes), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), graft.functions.expr
        .VectorExpressions.pqAdcCosine(col("codes"), col("lut"),
          pq.cwNorms2Flat, pq.ksub).as("cos"))
    val shortList = topKPerQuery(adc, refine * k).select("q_id", "vec_id")
    val rescored = emb(corpus).join(broadcast(shortList), "vec_id")
      .join(broadcast(q), "q_id")
      .select(col("q_id"), col("vec_id"),
        round(SimFns.cosine(col("emb"), col("q_emb")), 6).as("cos"))
    topKPerQuery(rescored, k)
  }

  /** Per-label centroid: dimension-wise mean via posexplode → (label, pos)
    * hash aggregation → ordered array rebuild. The posexplode shuffle key
    * (label, pos) is uniform, so centroid computation scales with
    * executors regardless of embedding count — the assignment step of a
    * k-means iteration, expressed relationally.
    *
    * The mean is fixed-point (per-element round to scaled long, exact
    * integer sum, one divide) — a raw double `avg` is partial-aggregation-
    * order dependent, so its low bits vary with partitioning and can flip a
    * rounded digit at a hash-compare boundary.
    */
  def labelCentroids(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label"), col("embedding").cast("array<double>").as("emb"))
      .select(col("label"), posexplode(col("emb")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(graft.functions.FxMath.scaledAvg(
        sum(round(col("x") * 1000000).cast("long")),
        count(lit(1)), 1000000L, 6).as("v"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("v")))),
        e => e.getField("v")).as("centroid"))

  /** Random-hyperplane LSH near-dup: 16 sign bits (4 bands × 4 bits) from
    * deterministic Gaussian hyperplanes; docs whose band values agree on
    * ≥1 band — exactly, or within Hamming distance 1 under multi-probe —
    * become candidates (always a bucket-key equi-join, never all-pairs),
    * refined with the exact cosine so the output has no false positives.
    *
    * Multi-probe is what makes one 16-bit layout serve the whole threshold
    * range: the probe side of the join emits, per band, the exact bucket
    * plus its 4 one-bit-flip neighbors (5 keys/band, 20 rows/doc), while
    * the index side stays exact (4 rows/doc). A pair collides when some
    * band differs by ≤1 bit, lifting per-band collision probability from
    * p⁴ to p⁴+4p³(1−p) — at the cos ≥ 0.4 regime (p ≈ 0.63) that is
    * 0.16 → 0.53 per band, ≈0.95 expected recall over 4 bands vs the
    * measured 0.50 of the exact-bucket layout; at cos ≥ 0.9 both layouts
    * are ≈1. The cost is a bounded 5× on probe-side shuffle rows and on
    * candidate pairs — still linear in corpus size for non-pathological
    * bucket distributions, which is the 100-TB property that matters.
    */
  def embeddingNearDupLsh(embeddings: DataFrame, threshold: Double,
                          seed: Long = 7L): DataFrame =
    embeddingNearDupLshWithPlanes(embeddings, lshPlanes(16, 64, seed), threshold)

  /** The 16 Gaussian hyperplanes behind [[embeddingNearDupLsh]], exposed so
    * they can be committed as a parquet fixture (gen.AnnIndexGen) and the
    * whole signature → band → multi-probe → refine pipeline replayed
    * exactly by the DuckDB oracle — the same train-once/commit/replay split
    * as the IVF centroids.
    */
  def lshPlanes(bits: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Committed-hyperplane fixture loader (`$path/planes`: p_id, p_vec);
    * parquet round-trips IEEE doubles exactly, so the loaded planes are
    * bit-identical to the generated ones and to what the oracle reads.
    */
  def loadPlanes(spark: org.apache.spark.sql.SparkSession,
                 path: String): Array[Array[Double]] = {
    import spark.implicits._
    spark.read.parquet(s"$path/planes").select("p_id", "p_vec")
      .as[(Int, Seq[Double])].collect().sortBy(_._1).map(_._2.toArray)
  }

  /** [[embeddingNearDupLsh]] against explicit hyperplanes. The sign bit of
    * the cosine equals the sign bit of the raw dot product (norms are
    * positive; a zero-norm vector yields null cosine → bit 0, exactly the
    * `dot > 0 = false` the oracle computes), so the cross-engine contract
    * is just bit-identical sequential dot products.
    */
  def embeddingNearDupLshWithPlanes(embeddings: DataFrame,
                                    planes: Array[Array[Double]],
                                    threshold: Double): DataFrame = {
    // 16 hyperplane dot products per row run in the scan task: fan out
    val corpus = Par.fanOutScan(emb(embeddings))
    val sig = planes.zipWithIndex.map { case (p, i) =>
      when(SimFns.cosine(col("emb"), typedLit(p.toSeq)) > 0, 1 << i).otherwise(0)
    }.reduce(_ + _)
    val signed = corpus.withColumn("sig", sig)
    def bandVal(b: Int) = shiftright(col("sig"), b * 4).bitwiseAND(15)
    val indexStructs = (0 until 4).map(b =>
      struct(lit(b).as("band"), bandVal(b).as("bv")))
    val probeStructs = (0 until 4).flatMap { b =>
      struct(lit(b).as("band"), bandVal(b).as("bv")) +:
        (0 until 4).map(i =>
          struct(lit(b).as("band"), bandVal(b).bitwiseXOR(lit(1 << i)).as("bv")))
    }
    def explodeBands(structs: Seq[org.apache.spark.sql.Column]) =
      signed.select(col("vec_id"), explode(array(structs: _*)).as("bb"))
        .select(col("vec_id"), col("bb.band").as("band"), col("bb.bv").as("bv"))
    val probes = explodeBands(probeStructs)
    val indexed = explodeBands(indexStructs)
    val candidates = probes.as("a").join(indexed.as("b"), Seq("band", "bv"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    candidates
      .join(corpus.select(col("vec_id").as("vec_a"), col("emb").as("ea")), "vec_a")
      .join(corpus.select(col("vec_id").as("vec_b"), col("emb").as("eb")), "vec_b")
      .select(col("vec_a"), col("vec_b"),
        round(SimFns.cosine(col("ea"), col("eb")), 4).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Embedding-cosine near-duplicate pairs above `threshold` — brute pairwise
    * at fixture scale; the LSH/IVF bucketing above is the scale path (pairs
    * within a bucket only). Kept exact here so the DuckDB oracle can mirror
    * it.
    *
    * Guarded: nothing in the pairwise form itself stops a caller pointing it
    * at a real corpus, so it refuses inputs above `maxRows`. The guard scans
    * at most maxRows+1 rows; the quadratic blowup it prevents scans n².
    */
  /** Int8 scalar quantization of the embedding column — the storage/shuffle
    * compression step a 100-TB vector corpus runs BEFORE indexing: each
    * vector is scaled by 127/max|v| and rounded to signed-byte integers,
    * shrinking every downstream shuffle and index partition ~4× (float32 →
    * int8) while cosine ranking survives within quantization error
    * (AnnSpec gates quantized-search recall). Zero shuffle — a narrow
    * per-row projection.
    *
    * Output is the exploded `(vec_id, pos, q)` stream (array columns are a
    * cross-engine hash hazard), with the per-vector `max_abs` scale carried
    * so the original is reconstructible to within half a quantization step.
    * Rounding is `floor(x + 0.5)` on IEEE doubles — exactly the same bits
    * in any engine, unlike `round()`, whose half-even/half-up convention
    * and decimal path differ across engines. Zero vectors quantize to 0.
    */
  def quantizeEmbeddings(embeddings: DataFrame): DataFrame = {
    val corpus = emb(embeddings)
    val maxAbs = array_max(transform(col("emb"), v => abs(v)))
    corpus
      .withColumn("max_abs", maxAbs)
      .select(col("vec_id"), col("max_abs"),
        posexplode(transform(col("emb"), v =>
          when(col("max_abs") === 0d, 0L)
            .otherwise(floor(v * lit(127.0) / col("max_abs") + lit(0.5)))))
          .as(Seq("pos", "q")))
      .select(col("vec_id"), col("pos").cast("int").as("pos"), col("q"),
        // unrounded: a pure float→double cast is bit-identical cross-engine
        col("max_abs"))
  }

  /** Exact top-k over the QUANTIZED corpus — [[bruteTopK]]'s plan shape
    * (broadcast queries, streaming scoring pass, bounded top-k aggregate)
    * with int8 vectors on the scan side. Cosine is scale-invariant, so the
    * per-vector 127/max|v| factor cancels and ranking quality depends only
    * on rounding error; AnnSpec gates its recall against the float path.
    */
  def quantizedTopK(embeddings: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val maxAbs = array_max(transform(col("emb"), v => abs(v)))
    val qcorpus = emb(embeddings)
      .withColumn("max_abs", maxAbs)
      .select(col("vec_id"),
        when(col("max_abs") === 0d,
          transform(col("emb"), _ => lit(0.0)))
        .otherwise(transform(col("emb"), v =>
          floor(v * lit(127.0) / col("max_abs") + lit(0.5)).cast("double")))
          .as("emb"))
    val queries = qcorpus.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val scored = qcorpus.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(SimFns.cosine(col("emb"), col("q_emb")), 6).as("cos"))
    topKPerQuery(scored, k)
  }

  def embeddingNearDup(embeddings: DataFrame, threshold: Double,
                       maxRows: Int = 100000): DataFrame = {
    require(embeddings.limit(maxRows + 1).count() <= maxRows,
      s"embeddingNearDup is the O(n²) oracle baseline — corpus exceeds " +
        s"$maxRows rows; use embeddingNearDupLsh (bucketed) instead")
    // fan the stream side out: the broadcast nested-loop evaluates n²/2
    // cosines in the stream side's (single-file ⇒ single) scan task
    val a = Par.fanOutScan(emb(embeddings))
      .select(col("vec_id").as("vec_a"), col("emb").as("ea"))
    val b = emb(embeddings).select(col("vec_id").as("vec_b"), col("emb").as("eb"))
    a.join(broadcast(b), col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(SimFns.cosine(col("ea"), col("eb")), 4).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540, §3): assign every vector to its nearest committed
    * coarse centroid (zero-shuffle codegen argmax), find duplicate pairs
    * ONLY within a cluster — a `bucket` equi-join + exact cosine refine,
    * so the pairwise work is Σ nᵢ² over cluster sizes instead of n² over
    * the corpus, which is the paper's entire scalability device — then
    * connect the pairs and keep one representative (min vec_id, the
    * engine-wide canonical-survivor convention of dedupClusters) per
    * duplicate group.
    *
    * Output is a per-vector keep/drop decision, singletons included:
    * (vec_id, bucket, group_id, n_members, keep). Pairs never cross
    * buckets, so groups are bucket-local by construction — cross-cluster
    * duplicates are the recall the paper deliberately trades for the
    * n²→Σnᵢ² cut (mitigable with `assignBucketsSpill`, the same boundary
    * lever IVF uses).
    *
    * Exactly oracle-able from the committed quantizer: given the centroid
    * fixture, assignment, pair set, and closure are deterministic
    * arithmetic DuckDB replays (the `ann_ivf_topk` pattern + the
    * recursive-CTE closure of `dedup_clusters`).
    */
  def semanticDedup(embeddings: DataFrame,
                    cents: Array[(Long, Array[Double])],
                    threshold: Double): DataFrame = {
    val assigned = assignBuckets(emb(embeddings), cents)
    semanticGroups(assigned, semanticPairs(assigned, threshold))
  }

  /** [[semanticDedup]] with spill assignment: pairs are discovered in ANY
    * of each vector's `spill` nearest buckets (the same boundary-recall
    * lever IVF uses — a pair straddling a cluster boundary still shares
    * the runner-up bucket), then deduplicated, so the found set is a
    * superset of the spill=1 set at a bounded ≤ spill× pair-generation
    * cost. Reported `bucket` stays the PRIMARY (nearest) assignment;
    * groups may now legitimately span primary buckets — that is the
    * cross-cluster recall the plain form trades away.
    */
  def semanticDedupSpill(embeddings: DataFrame,
                         cents: Array[(Long, Array[Double])],
                         threshold: Double, spill: Int = 2): DataFrame = {
    val corpus = emb(embeddings)
    val spilled = assignBucketsSpill(corpus, cents, spill)
    // the same pair can collide in up to `spill` shared buckets → distinct
    val pairs = semanticPairs(spilled, threshold).distinct()
    semanticGroups(assignBuckets(corpus, cents), pairs)
  }

  /** [[semanticDedupSpill]] with the spill decided BY THE DATA instead of
    * a fixed factor: every vector keeps its primary assignment, and a
    * runner-up (up to `spillMax − 1` of them) is kept only when the
    * vector sits close to that boundary — its cosine MARGIN to the winner
    * (`cos(v, c₁) − cos(v, cᵣ)`, rounded to 6) is at or below a cut
    * derived from the committed quantizer's boundary-distance
    * distribution: the `budgetFrac` quantile of the corpus's runner-up
    * margins, taken over the deterministic bottom-k-by-hash sample
    * ([[graft.functions.expr.Sketches]] — O(k) state, exactly replayable
    * cross-engine, the `corpus_token_quantiles_sample` device).
    *
    * WHAT THE DATA SAYS (AdaptiveSpillSweep, BASELINE.md): this is a
    * BUDGET KNOB between fixed spill levels, not a free win. The
    * boundary-margin hypothesis — "cross-cluster duplicates live at
    * small assignment margins, so targeting them beats uniform spill at
    * equal budget" — did NOT reproduce at the diffuse 0.4 threshold: at
    * matched candidate-pair budget, uniform spill=2 finds more pairs.
    * What holds, on both fixture scales, is the Pareto point: spillMax=3
    * / budgetFrac=0.5 spends ~72 % of spill=2's Σnᵢ² candidate budget
    * and recovers 83-92 % of its found pairs (vs spill=1's ~25 % budget
    * for ~40 %), gated in `AnnSpec`. Margin targeting should pay off
    * where duplicates are TIGHT (θ small forces near-equal centroid
    * cosines); measure on the target corpus before preferring it.
    *
    * Scale shape: ranked assignment is the same zero-shuffle codegen
    * expression; the margin computation adds ONE narrow shuffle of
    * spillMax·n (vec_id, rank, cos) rows (a window over spillMax-row
    * groups) at build time — the price of the data-driven cut, paid once
    * per quantizer commit, not per probe.
    */
  def semanticDedupAdaptive(embeddings: DataFrame,
                            cents: Array[(Long, Array[Double])],
                            threshold: Double, spillMax: Int = 3,
                            budgetFrac: Double = 0.5): DataFrame = {
    val corpus = emb(embeddings)
    val kept = adaptiveSpillAssignments(corpus, cents, spillMax, budgetFrac)
    val pairs = semanticPairs(kept, threshold).distinct()
    semanticGroups(assignBuckets(corpus, cents), pairs)
  }

  /** The adaptive assignment set of [[semanticDedupAdaptive]] —
    * `(vec_id, emb, bucket)` rows, primary always present, runner-ups
    * margin-gated. Exposed for the AnnSpec budget/recall gate.
    */
  private[graft] def adaptiveSpillAssignments(
      corpus: DataFrame, cents: Array[(Long, Array[Double])],
      spillMax: Int, budgetFrac: Double): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    require(spillMax >= 2, "adaptive spill needs at least one runner-up rank")
    // rk=1 rows exist only when there IS a runner-up centroid; with one
    // centroid the margin distribution is empty and the percentile below
    // would surface as a bare NPE on getDouble
    require(cents.length >= 2,
      s"adaptive spill needs at least 2 centroids for a runner-up margin; got ${cents.length}")
    val centDf = broadcast(
      cents.toSeq.map { case (id, e) => (id, e.toSeq) }.toDF("c_id", "c_emb"))
    // ranked spillMax-nearest assignment: the same codegen argmax/tie
    // order as assignBuckets, position = rank
    val ranked = corpus.select(col("vec_id"), col("emb"),
        posexplode(graft.functions.expr.VectorExpressions.nearestCentroids(
          col("emb"), cents.map(_._1), cents.map(_._2), spillMax))
          .as(Seq("rk", "bucket")))
      .join(centDf, col("bucket") === col("c_id"))
      .withColumn("cosv", graft.functions.SimFns.cosine(col("emb"), col("c_emb")))
      .select(col("vec_id"), col("emb"), col("rk"), col("bucket"), col("cosv"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
    // checkpointed: consumed by the sample-cut job AND the kept filter
    val withMargin = ranked.withColumn("margin",
      round(max(when(col("rk") === 0, col("cosv"))).over(w) - col("cosv"), 6))
      .localCheckpoint(true)
    val sk = graft.functions.expr.Sketches
    // the boundary-distance distribution: runner-up margins, sampled
    // bottom-256-by-hash, exact interpolated percentile over the sample;
    // round 4 (the cross-engine interpolation-order convention)
    val cutRow = withMargin.filter(col("rk") === 1)
      .select(sk.mhash61(col("vec_id")).as("h"), col("margin").as("m"))
      .agg(sk.bottomKSample(col("h"), col("m"), 256).as("smp"))
      .select(explode(col("smp")).as("m"))
      .agg(expr(s"percentile(m, ${budgetFrac}D)").as("q"))
      .select(round(col("q"), 4).as("cut")).head()
    // null percentile = no runner-up rows at all (empty embeddings input);
    // any cut value is then vacuously correct — the filter below keeps
    // nothing either way — but getDouble on a null would NPE opaquely
    val cut = if (cutRow.isNullAt(0)) 0.0 else cutRow.getDouble(0)
    withMargin
      .filter(col("rk") === 0 || col("margin") <= lit(cut))
      .select(col("vec_id"), col("emb"), col("bucket"))
  }

  /** Within-bucket candidate pairs above `threshold` — the Σnᵢ² kernel
    * shared by both semantic-dedup forms.
    */
  private[graft] def semanticPairs(assigned: DataFrame, threshold: Double): DataFrame =
    assigned
      .select(col("bucket"), col("vec_id").as("vec_a"), col("emb").as("ea"))
      .join(assigned.select(col("bucket"), col("vec_id").as("vec_b"),
        col("emb").as("eb")), Seq("bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .filter(round(SimFns.cosine(col("ea"), col("eb")), 4) >= threshold)
      .select(col("vec_a").as("src"), col("vec_b").as("dst"))

  /** Close the pair set, attach singletons, and emit the per-vector
    * keep/drop verdict (min-id survivor per group).
    */
  private def semanticGroups(primary: DataFrame, pairs: DataFrame): DataFrame = {
    val cc = Components.connectedComponents(pairs)
      .select(col("node").as("vec_id"), col("component"))
    val grouped = primary.select(col("vec_id"), col("bucket"))
      .join(cc, Seq("vec_id"), "left")
      .select(col("vec_id"), col("bucket"),
        coalesce(col("component"), col("vec_id")).as("group_id"))
    val sizes = grouped.groupBy(col("group_id"))
      .agg(count(lit(1)).as("n_members"))
    grouped.join(sizes, "group_id") // groups ≪ vectors: AQE broadcasts
      .select(col("vec_id"), col("bucket"), col("group_id"), col("n_members"),
        (col("vec_id") === col("group_id")).as("keep"))
  }
}
