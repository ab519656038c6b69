package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the similarity hot paths.
  *
  * Spark's higher-order functions (`aggregate`/`zip_with`/`transform`) are
  * evaluated interpretively — per-element lambda dispatch with boxing. For
  * a 64-float cosine inside an all-pairs join, or a 64-bit-per-token
  * SimHash fold, that interpretation dominated the sf0.1 bench by 100×+
  * (dedup_simhash 228 s, dedup_embedding 99 s). These expressions follow
  * SURVEY.md §7's preference order: a scalar `Expression` (codegen'd where
  * it pays) before UDFs — the per-row work becomes one tight primitive
  * loop inside whole-stage codegen.
  */

/** Cosine similarity over two `array<double>` columns in a single pass
  * (dot + both norms accumulated in index order, so results are
  * bit-identical to the sequential-fold formula the DuckDB oracle uses:
  * dot / (sqrt(na)*sqrt(nb)), null on zero/mismatched vectors).
  */
case class CosineSim(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }

  // every local is ctx.freshName'd: multiple CosineSim instances routinely
  // share one codegen function (the 16-plane LSH signature, IVF argmax), and
  // fixed names collide — Janino then rejects the whole function and the
  // projection silently falls back to the interpreter
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = $a.getDouble($i);
         |    double $y = $b.getDouble($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |  if ($denom == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / $denom;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** 64-bit SimHash over an `array<string>` token column: per token one
  * xxhash64, signed bit-count accumulation in a primitive local array,
  * packed to a long. Single expression call per row (eval-based — the work
  * is inside the JVM loop, so codegen would only save the call).
  */
case class SimHash64(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) out |= 1L << j
      j += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** MinHash signature over an `array<string>` shingle column: one xxhash64
  * per shingle, then `numHashes` cheap universal-hash permutations
  * (a_i·h + b_i with splitmix-derived odd constants) — the classic
  * one-hash MinHash, O(shingles + numHashes) instead of
  * O(shingles × numHashes) full hashes.
  */
case class MinHashSig(child: Expression, numHashes: Int)
  extends UnaryExpression with CodegenFallback {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  // deterministic splitmix64-expanded permutation constants (a odd)
  private lazy val (as, bs) = {
    var s = 0x9e3779b97f4a7c15L
    def next(): Long = {
      s += 0x9e3779b97f4a7c15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val a = Array.fill(numHashes)(next() | 1L)
    val b = Array.fill(numHashes)(next())
    (a, b)
  }

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      var k = 0
      while (k < numHashes) {
        val p = as(k) * h + bs(k)
        if (p < mins(k)) mins(k) = p
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

/** Distinct word n-gram shingles over a string column in one pass:
  * whitespace split, UTF8String n-gram concat, LinkedHashSet distinct
  * (first-occurrence order). Replaces a transform/slice/array_join HOF
  * chain that was interpreted per shingle and recomputed on every plan
  * branch of the similarity joins. Docs shorter than n collapse to one
  * whole-doc shingle (same semantics as TextFns.shingles).
  */
case class Shingles(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"

  private val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  override protected def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].split(space, -1)
    val out = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
    if (toks.length < n) {
      out.add(org.apache.spark.unsafe.types.UTF8String.concatWs(space, toks: _*))
    } else {
      var i = 0
      while (i <= toks.length - n) {
        val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
        System.arraycopy(toks, i, parts, 0, n)
        out.add(org.apache.spark.unsafe.types.UTF8String.concatWs(space, parts: _*))
        i += 1
      }
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(c: Expression): Shingles = copy(child = c)
}

/** Per-document bigram repetition statistics over a string column in one
  * pass: whitespace split (same tokenization as [[Shingles]], so the DuckDB
  * `string_split(text, ' ')` oracle mirrors it exactly), then one linear
  * scan accumulating total / distinct / max-count bigrams in a per-row hash
  * map. Returns `struct(n_bigrams, n_distinct, top)`, or null for documents
  * with fewer than two tokens (no bigrams — callers filter these, matching
  * the oracle's `len(w) >= 2`).
  *
  * This replaces a corpus-wide `explode` + two-level hash aggregation: the
  * statistics are per-document and every document is one row, so no shuffle
  * is ever needed. The scan is O(tokens) per row (hash-map upserts, not the
  * O(len²) array-HOF count a naive per-row rewrite would use) and the map's
  * memory is bounded by the document's own distinct-bigram count — the same
  * order as the row already materialized in the scan. Work is the per-token
  * loop inside eval; codegen would only save the call (same argument as
  * [[SimHash64]]).
  */
case class BigramStats(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top", LongType, nullable = false)))
  override def prettyName: String = "bigram_stats"

  private val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  override protected def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].split(space, -1)
    if (toks.length < 2) return null
    val counts =
      new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer]()
    var top = 0
    var i = 0
    while (i < toks.length - 1) {
      val bg = org.apache.spark.unsafe.types.UTF8String
        .concatWs(space, toks(i), toks(i + 1))
      val c = counts.merge(bg, 1, (a: Integer, b: Integer) => Integer.valueOf(a + b))
      if (c > top) top = c
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any]((toks.length - 1).toLong, counts.size().toLong, top.toLong))
  }

  override protected def withNewChildInternal(c: Expression): BigramStats =
    copy(child = c)
}

/** Order-sensitive polynomial rolling hash over a string's codepoints:
  * `h := (h·131 + codepoint) mod (2³¹−1)`, h₀ = 0 — the classic Rabin-Karp
  * fingerprint. The modulus keeps every intermediate well inside a long, so
  * the same fold is expressible in any engine with 64-bit integers (the
  * DuckDB oracle mirrors it with `list_reduce` over `unicode()` codepoints —
  * unlike the previous xxhash64 chain, which no other engine can reproduce).
  * Empty input hashes to 0. Work is the per-codepoint loop inside eval;
  * codegen would only save the call.
  */
case class PolyRollingHash(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_rolling_hash"

  override protected def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 131L + cp) % 2147483647L
      i += Character.charCount(cp)
    }
    java.lang.Long.valueOf(h)
  }

  override protected def withNewChildInternal(c: Expression): PolyRollingHash =
    copy(child = c)
}

/** Nearest-centroid assignment over an `array<double>` embedding column:
  * argmax of cosine similarity against a driver-held centroid table
  * (`ids(i)` ↔ `cents(i)`), the per-row kernel of IVF index build / k-means
  * Lloyd assignment. The centroid table rides along in the expression (task
  * closure — the executor-local broadcast of a model that is tiny by
  * construction), so assignment is a narrow projection: no join, no shuffle,
  * embarrassingly parallel over the corpus scan.
  *
  * Ties (equal cosine, incl. the all-degenerate case where every cosine is
  * undefined) resolve to the larger centroid id — deterministic regardless
  * of centroid array order. Work is the C×dim primitive loop inside eval;
  * codegen would only save the call (same argument as [[SimHash64]]).
  */
case class NearestCentroid(child: Expression, ids: Array[Long],
                           cents: Array[Array[Double]])
  extends UnaryExpression with CodegenFallback {

  require(ids.length == cents.length && ids.nonEmpty,
    "centroid ids and vectors must align and be non-empty")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_centroid"

  private lazy val norms: Array[Double] = cents.map { c =>
    var s = 0.0; var j = 0
    while (j < c.length) { s += c(j) * c(j); j += 1 }
    math.sqrt(s)
  }

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData].toDoubleArray()
    var nx = 0.0
    var i = 0
    while (i < x.length) { nx += x(i) * x(i); i += 1 }
    val xNorm = math.sqrt(nx)
    var bestCos = Double.NegativeInfinity
    var bestId = Long.MinValue
    var c = 0
    while (c < cents.length) {
      val ce = cents(c)
      var cos = Double.NegativeInfinity // undefined (zero-norm/mismatch) loses
      if (ce.length == x.length) {
        var dot = 0.0
        var j = 0
        while (j < ce.length) { dot += x(j) * ce(j); j += 1 }
        val denom = xNorm * norms(c)
        if (denom != 0.0) cos = dot / denom
      }
      // -inf == -inf, so degenerate rows still resolve via the id tiebreak
      if (cos > bestCos || (cos == bestCos && ids(c) > bestId)) {
        bestCos = cos; bestId = ids(c)
      }
      c += 1
    }
    java.lang.Long.valueOf(bestId)
  }

  override protected def withNewChildInternal(c: Expression): NearestCentroid =
    copy(child = c)
}

/** The `k` nearest centroids by cosine, best first — the multi-assignment
  * ("spill") variant of [[NearestCentroid]]: IVF indexes replicate each
  * vector into its k nearest inverted lists so boundary vectors stay
  * findable at small nprobe, trading k× index size for recall. Same
  * tie-break discipline (equal cosine → larger id first) so the result is
  * independent of centroid array order; `k = 1` agrees with
  * [[NearestCentroid]] by construction.
  */
case class NearestCentroids(child: Expression, ids: Array[Long],
                            cents: Array[Array[Double]], k: Int)
  extends UnaryExpression with CodegenFallback {

  require(ids.length == cents.length && ids.nonEmpty,
    "centroid ids and vectors must align and be non-empty")
  require(k >= 1, "k must be >= 1")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  private lazy val norms: Array[Double] = cents.map { c =>
    var s = 0.0; var j = 0
    while (j < c.length) { s += c(j) * c(j); j += 1 }
    math.sqrt(s)
  }

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData].toDoubleArray()
    var nx = 0.0
    var i = 0
    while (i < x.length) { nx += x(i) * x(i); i += 1 }
    val xNorm = math.sqrt(nx)
    val cos = new Array[Double](cents.length)
    var c = 0
    while (c < cents.length) {
      val ce = cents(c)
      var s = Double.NegativeInfinity
      if (ce.length == x.length) {
        var dot = 0.0
        var j = 0
        while (j < ce.length) { dot += x(j) * ce(j); j += 1 }
        val denom = xNorm * norms(c)
        if (denom != 0.0) s = dot / denom
      }
      cos(c) = s
      c += 1
    }
    val n = math.min(k, cents.length)
    val picked = new Array[Long](n)
    val used = new Array[Boolean](cents.length)
    var slot = 0
    while (slot < n) {
      var bestCos = Double.NegativeInfinity
      var bestId = Long.MinValue
      var bestIdx = -1
      var j = 0
      while (j < cents.length) {
        if (!used(j) &&
            (cos(j) > bestCos || (cos(j) == bestCos && ids(j) > bestId))) {
          bestCos = cos(j); bestId = ids(j); bestIdx = j
        }
        j += 1
      }
      used(bestIdx) = true
      picked(slot) = ids(bestIdx)
      slot += 1
    }
    new GenericArrayData(picked)
  }

  override protected def withNewChildInternal(c: Expression): NearestCentroids =
    copy(child = c)
}

/** Product-quantization encode (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011): the vector is split into
  * `m = codebooks.length` contiguous subvectors and each is replaced by the
  * index of its nearest (L2) codeword in that subspace's codebook — a
  * 64-float vector becomes `m` small integers, the compression that lets a
  * 100-TB embedding corpus's search structure fit a fraction of the space
  * (dim·4 bytes → m codes). The codebook rides in the expression (task
  * closure, tiny by construction — m·ksub·dsub doubles), so encoding is a
  * narrow projection: no join, no shuffle.
  *
  * Ties (equal distance) resolve to the SMALLER code index — deterministic
  * for any codebook order. A vector whose length isn't `m·dsub` encodes as
  * null (it cannot be quantized in this model), mirroring [[CosineSim]]'s
  * undefined-input contract.
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
  extends UnaryExpression with CodegenFallback {

  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "need at least one codebook with at least one codeword")
  private val m = codebooks.length
  private val dsub = codebooks(0)(0).length
  require(codebooks.forall(_.forall(_.length == dsub)),
    "all codewords must have the subspace dimension")

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData].toDoubleArray()
    if (x.length != m * dsub) return null
    val codes = new Array[Int](m)
    var sub = 0
    while (sub < m) {
      val cb = codebooks(sub)
      val off = sub * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val cw = cb(c)
        var d = 0.0
        var j = 0
        while (j < dsub) {
          val diff = x(off + j) - cw(j); d += diff * diff; j += 1
        }
        if (d < bestD) { bestD = d; best = c } // strict < keeps smaller index on ties
        c += 1
      }
      codes(sub) = best
      sub += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(c: Expression): PqEncode =
    copy(child = c)
}

/** Per-query ADC lookup table for [[PqAdcCosine]]: entry `[sub·ksub + c]` is
  * `dot(q_sub, codeword_c) / |q|` — the query-dependent half of the cosine
  * between the query and any PQ-reconstructed vector, precomputed ONCE per
  * query (m·ksub dots) so scoring a candidate is m table lookups instead of
  * a dim-length dot product. Null for a zero-norm or wrong-length query
  * (no defined cosine), matching [[CosineSim]].
  */
case class PqLutCosine(child: Expression, codebooks: Array[Array[Array[Double]]])
  extends UnaryExpression with CodegenFallback {

  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "need at least one codebook with at least one codeword")
  private val m = codebooks.length
  private val dsub = codebooks(0)(0).length
  private val ksub = codebooks.map(_.length).max

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut_cosine"

  override protected def nullSafeEval(v: Any): Any = {
    val q = v.asInstanceOf[ArrayData].toDoubleArray()
    if (q.length != m * dsub) return null
    var nq = 0.0
    var i = 0
    while (i < q.length) { nq += q(i) * q(i); i += 1 }
    val qNorm = math.sqrt(nq)
    if (qNorm == 0.0) return null
    val lut = new Array[Double](m * ksub)
    var sub = 0
    while (sub < m) {
      val cb = codebooks(sub)
      val off = sub * dsub
      var c = 0
      while (c < cb.length) {
        val cw = cb(c)
        var dot = 0.0
        var j = 0
        while (j < dsub) { dot += q(off + j) * cw(j); j += 1 }
        lut(sub * ksub + c) = dot / qNorm
        c += 1
      }
      sub += 1
    }
    new GenericArrayData(lut)
  }

  override protected def withNewChildInternal(c: Expression): PqLutCosine =
    copy(child = c)
}

/** Asymmetric-distance cosine: given a candidate's PQ `codes` and a query's
  * [[PqLutCosine]] table, the EXACT cosine between the query and the
  * candidate's reconstruction is `Σ_sub lut[sub·ksub + code_sub] /
  * sqrt(Σ_sub |codeword|²)` — the reconstruction's norm decomposes over
  * subspaces because they partition the dimensions. The query-independent
  * codeword norms ride statically in the expression; per candidate the
  * work is m lookups + m adds, independent of the original dimension.
  * Null when no codeword mass (zero reconstruction — no defined cosine).
  */
case class PqAdcCosine(left: Expression, right: Expression,
                       cwNorms2: Array[Double], ksub: Int)
  extends BinaryExpression with CodegenFallback {

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_cosine"

  override protected def nullSafeEval(codesAny: Any, lutAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val lut = lutAny.asInstanceOf[ArrayData]
    val m = codes.numElements()
    var dot = 0.0
    var n2 = 0.0
    var sub = 0
    while (sub < m) {
      val idx = sub * ksub + codes.getInt(sub)
      dot += lut.getDouble(idx)
      n2 += cwNorms2(idx)
      sub += 1
    }
    val denom = math.sqrt(n2)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcCosine =
    copy(left = l, right = r)
}

/** PCA projection against a driver-trained model carried in the closure
  * (the [[PqEncode]] pattern): for each of the k committed components,
  * `dot(x, w_c) − (μ·w_c)` with the dot accumulated in index order — the
  * same sequential fold DuckDB's `list_inner_product` uses, and the
  * centering rewritten as a PRECOMPUTED per-component constant (`μ·w_c`)
  * so neither engine sums `(x_j − μ_j)·w_j` in a different order. One
  * narrow pass per row, no join, no shuffle: at 100 TB this is a map-only
  * projection stage. A wrong-length vector FAILS the query (matching
  * `Pca.trainPca`'s contract — a silent null would be dropped by the
  * downstream posexplode and surface only as an opaque row-count
  * mismatch against the oracle).
  */
case class PcaProject(child: Expression, components: Array[Array[Double]],
                      muDots: Array[Double])
  extends UnaryExpression with CodegenFallback {

  require(components.nonEmpty && components.length == muDots.length,
    "one mu-dot per component")
  private val dim = components(0).length
  require(components.forall(_.length == dim),
    "all components must share the embedding dimension")

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pca_project"

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData].toDoubleArray()
    require(x.length == dim,
      s"pca_project: embedding dim ${x.length} != model dim $dim")
    val out = new Array[Double](components.length)
    var c = 0
    while (c < components.length) {
      val w = components(c)
      var dot = 0.0
      var j = 0
      while (j < dim) { dot += x(j) * w(j); j += 1 }
      out(c) = dot - muDots(c)
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): PcaProject =
    copy(child = c)
}

/** Column-API façade. */
object VectorExpressions {
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def simhash64(toks: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(toks)))
  def minhashSig(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingles), numHashes))
  def shingles(text: Column, n: Int): Column =
    ColumnBridge.column(Shingles(ColumnBridge.expression(text), n))
  def nearestCentroid(emb: Column, ids: Array[Long],
                      cents: Array[Array[Double]]): Column =
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(emb), ids, cents))
  def nearestCentroids(emb: Column, ids: Array[Long],
                       cents: Array[Array[Double]], k: Int): Column =
    ColumnBridge.column(NearestCentroids(ColumnBridge.expression(emb), ids, cents, k))
  def pqEncode(emb: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(emb), codebooks))
  def pqLutCosine(emb: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqLutCosine(ColumnBridge.expression(emb), codebooks))
  def pqAdcCosine(codes: Column, lut: Column, cwNorms2: Array[Double],
                  ksub: Int): Column =
    ColumnBridge.column(PqAdcCosine(ColumnBridge.expression(codes),
      ColumnBridge.expression(lut), cwNorms2, ksub))
  def pcaProject(emb: Column, components: Array[Array[Double]],
                 muDots: Array[Double]): Column =
    ColumnBridge.column(PcaProject(ColumnBridge.expression(emb), components, muDots))
  def polyRollingHash(text: Column): Column =
    ColumnBridge.column(PolyRollingHash(ColumnBridge.expression(text)))
  def bigramStats(text: Column): Column =
    ColumnBridge.column(BigramStats(ColumnBridge.expression(text)))
}
