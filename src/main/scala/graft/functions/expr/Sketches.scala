package graft.functions.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Engine-owned, CROSS-ENGINE-REPLAYABLE approximation sketches.
  *
  * Spark's native `approx_count_distinct` (HLL++) and `approx_percentile`
  * (rank sketch) are black boxes: no other engine can reproduce their
  * estimates, so queries built on them can only ever be property-gated,
  * never audited row-for-row. At 100 TB an unauditable estimator is a
  * liability — a silent regression in an upstream hash or merge produces
  * a plausible-but-wrong number nothing can catch. These sketches make
  * the opposite trade: every step is specified integer/IEEE arithmetic
  * that DuckDB replays exactly in SQL, so the ESTIMATE ITSELF
  * hash-matches across engines (the `fixtures/annidx` committed-model
  * idea, applied to aggregation).
  *
  *  - [[MersenneHash61]]: h(x) = ((A·x + B) mod (2⁶¹−1)) + 1 — a
  *    pairwise-independent multiply-mod-Mersenne hash. The 128-bit
  *    product is folded with 2⁶⁴ ≡ 8 (mod 2⁶¹−1); DuckDB mirrors it as
  *    plain `(A::HUGEINT * x + B) % M + 1`.
  *  - [[KmvDistinctAgg]]: K-minimum-values distinct-count sketch
  *    (Bar-Yossef et al. 2002; Beyer et al. SIGMOD'07 — the estimator
  *    family behind DataSketches' theta sketch). State is the k smallest
  *    distinct hash values — bounded, mergeable by set-union-truncate,
  *    map-side combining. Estimate: exact size below k, else
  *    round((k−1)·M / h₍ₖ₎); relative error ≈ 1/√(k−2).
  *  - [[BottomKSampleAgg]]: deterministic bottom-k-by-hash sample — the
  *    bounded-state form of uniform row sampling (order by h(row), keep
  *    k). Downstream exact quantiles over the sample give
  *    approximate-quantiles with O(k) state per group; DuckDB replays
  *    the subset with `row_number() OVER (ORDER BY h, value) <= k`.
  *
  * Both aggregates are `TypedImperativeAggregate`: the hot path mutates
  * one JVM `TreeSet` per (group × partition) and serializes only at
  * shuffle boundaries — the same execution shape as Spark's own
  * HLL++/percentile aggregates, so the replayability costs nothing
  * structural. Inputs are assumed non-negative (ids/keys); both engines
  * would diverge on negative `%` semantics.
  */
object Sketches {
  /** Modulus 2⁶¹ − 1 (Mersenne). */
  val M: Long = (1L << 61) - 1
  /** Fixed hash constants (odd, < 2⁶¹). Two rounds: a single
    * multiply-mod is pairwise independent but leaves enough structure on
    * sequential ids to inflate KMV variance measurably (−30% on one
    * fixture group at k=64); the xor-fold between rounds breaks it
    * (every group within 2σ of the 1/√(k−2) rsd).
    */
  val A: Long = 1803442709493370049L
  val B: Long = 721023537907183043L
  val A2: Long = 1469598103934665603L
  val B2: Long = 1099511628211L

  def mhash61(x: Column): Column =
    ColumnBridge.column(MersenneHash61(ColumnBridge.expression(x)))

  def kmvDistinct(hash: Column, k: Int): Column =
    ColumnBridge.column(
      KmvDistinctAgg(ColumnBridge.expression(hash), k).toAggregateExpression())

  def bottomKSample(hash: Column, value: Column, k: Int): Column =
    ColumnBridge.column(
      BottomKSampleAgg(ColumnBridge.expression(hash),
        ColumnBridge.expression(value), k).toAggregateExpression())

  /** The KMV bottom-k hash SET itself (sorted ascending array<long>)
    * rather than the point estimate — the MERGEABLE form: per-partition
    * sets union/truncate to the exact global bottom-k (any hash among
    * the global k smallest is among its home partition's k smallest), so
    * incremental stats maintenance re-sketches only changed partitions
    * and merges driver-side ([[graft.pipeline.Upsert.analyzeTableIncremental]]).
    */
  def kmvSet(hash: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSetAgg(ColumnBridge.expression(hash), k).toAggregateExpression())

  /** Merge bottom-k sets (each sorted ascending) to the global bottom-k,
    * and the estimate the merged set implies — Math.floor(e + 0.5), the
    * identical arithmetic to [[KmvDistinctAgg]].eval / the DuckDB round()
    * replay.
    */
  def kmvMergeEstimate(sets: Seq[Array[Long]], k: Int): Long = {
    val merged = new java.util.TreeSet[java.lang.Long]()
    sets.foreach(_.foreach { h =>
      if (merged.size < k) merged.add(h)
      else if (h < merged.last) { if (merged.add(h)) merged.pollLast() }
    })
    if (merged.size < k) merged.size.toLong
    else Math.floor((k - 1).toDouble * M.toDouble / merged.last.toDouble + 0.5).toLong
  }

  /** DuckDB fragment computing the same h(x) (x must be non-negative):
    * round 1 in HUGEINT, xor-fold in BIGINT (h₁ < 2⁶¹ fits), round 2 in
    * HUGEINT, + 1.
    */
  def mhash61Sql(x: String): String = {
    val h1 = s"CAST((CAST($A AS HUGEINT) * ($x) + $B) % $M AS BIGINT)"
    s"(CAST((CAST($A2 AS HUGEINT) * xor($h1, $h1 >> 31) + $B2) % $M AS BIGINT) + 1)"
  }

  /** (a·y + b) mod M for 0 ≤ y < 2⁶¹, exact via 128-bit fold:
    * a, y < 2⁶¹ ⇒ product < 2¹²², hi < 2⁵⁸; 2⁶⁴ ≡ 8 (mod M) and the
    * unsigned lo splits as (lo >>> 61)·2⁶¹ + (lo & M) with 2⁶¹ ≡ 1.
    */
  private def mulAddMod(a: Long, y: Long, b: Long): Long = {
    val lo = a * y
    val hi = Math.multiplyHigh(a, y)
    var s = hi * 8 + (lo >>> 61) + (lo & M)
    while (s >= M) s -= M
    s += b
    if (s >= M) s -= M
    s
  }

  /** h(x) ∈ [1, M] for a non-negative long — two multiply-mod rounds with
    * an xor-fold between them; bit-identical to [[mhash61Sql]].
    */
  private[expr] def hash(x: Long): Long = {
    val h1 = mulAddMod(A, x % M, B) // x < 2⁶³, x ≥ 0 ⇒ one reduction
    val y = h1 ^ (h1 >>> 31)
    mulAddMod(A2, y, B2) + 1
  }
}

/** h(x) = ((A·x + B) mod (2⁶¹−1)) + 1 ∈ [1, 2⁶¹−1] over a non-negative
  * long — see [[Sketches]].
  */
case class MersenneHash61(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "mhash61"

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[Long]
    // fail fast: for x < 0, Scala's % and the unsigned 128-bit fold diverge
    // from the DuckDB mhash61Sql mirror — a silent sketch-replay break that
    // would only surface as a distant downstream hash mismatch
    if (x < 0)
      throw new IllegalArgumentException(
        s"mhash61 requires a non-negative input, got $x")
    java.lang.Long.valueOf(Sketches.hash(x))
  }

  override protected def withNewChildInternal(c: Expression): MersenneHash61 =
    copy(child = c)
}

/** KMV distinct-count sketch over a pre-hashed column — see [[Sketches]].
  * Returns BIGINT: exact distinct-hash count below k, else the k-th
  * minimum estimator rounded half-up.
  */
case class KmvDistinctAgg(child: Expression, k: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 16, s"kmv_distinct needs k >= 16, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_distinct"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(b: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      if (b.size < k) b.add(h)
      else if (h < b.last) { if (b.add(h)) b.pollLast() }
    }
    b
  }

  override def merge(b: java.util.TreeSet[java.lang.Long],
                     o: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = o.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (b.size < k) b.add(h)
      else if (h < b.last) { if (b.add(h)) b.pollLast() }
    }
    b
  }

  override def eval(b: java.util.TreeSet[java.lang.Long]): Any =
    if (b.size < k) b.size.toLong
    else {
      // hₖ = the k-th smallest hash; h uniform on [1, M] ⇒ (k−1)/(hₖ/M)
      val e = (k - 1).toDouble * Sketches.M.toDouble / b.last.toDouble
      java.lang.Long.valueOf(Math.floor(e + 0.5).toLong)
    }

  override def serialize(b: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 8 * b.size)
    buf.putInt(b.size)
    val it = b.iterator()
    while (it.hasNext) buf.putLong(it.next())
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val b = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { b.add(buf.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvDistinctAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvDistinctAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvDistinctAgg =
    copy(child = c.head)
}

/** [[KmvDistinctAgg]]'s buffer with the SET as the result (sorted
  * ascending array<long>, size ≤ k) — the mergeable per-partition form;
  * see [[Sketches.kmvSet]].
  */
case class KmvSetAgg(child: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 16, s"kmv_set needs k >= 16, got $k")

  private val inner = KmvDistinctAgg(child, k)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_set"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    inner.createAggregationBuffer()
  override def update(b: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] =
    inner.update(b, input)
  override def merge(b: java.util.TreeSet[java.lang.Long],
                     o: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] =
    inner.merge(b, o)
  override def eval(b: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](b.size)
    val it = b.iterator(); var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
  override def serialize(b: java.util.TreeSet[java.lang.Long]): Array[Byte] =
    inner.serialize(b)
  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] =
    inner.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KmvSetAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSetAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvSetAgg =
    copy(child = c.head)
}

/** Deterministic bottom-k-by-hash row sample — see [[Sketches]]. Keeps
  * the k (hash, value) pairs smallest under (hash asc, value asc) and
  * returns the sampled VALUES sorted ascending as array<double>.
  */
case class BottomKSampleAgg(hashChild: Expression, valueChild: Expression,
                            k: Int,
                            mutableAggBufferOffset: Int = 0,
                            inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Long, Double)]] {

  require(k >= 1, s"bottom_k_sample needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(hashChild, valueChild)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "bottom_k_sample"

  private implicit val ord: Ordering[(Long, Double)] =
    Ordering.Tuple2(Ordering.Long, Ordering.Double.TotalOrdering)

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Double)] =
    new java.util.TreeSet[(Long, Double)](ord)

  private def offer(b: java.util.TreeSet[(Long, Double)], e: (Long, Double)): Unit = {
    if (b.size < k) b.add(e)
    else if (ord.lt(e, b.last)) { if (b.add(e)) b.pollLast() }
  }

  override def update(b: java.util.TreeSet[(Long, Double)],
                      input: InternalRow): java.util.TreeSet[(Long, Double)] = {
    val h = hashChild.eval(input)
    val v = valueChild.eval(input)
    if (h != null && v != null)
      offer(b, (h.asInstanceOf[Long], v.asInstanceOf[Double]))
    b
  }

  override def merge(b: java.util.TreeSet[(Long, Double)],
                     o: java.util.TreeSet[(Long, Double)]): java.util.TreeSet[(Long, Double)] = {
    val it = o.iterator()
    while (it.hasNext) offer(b, it.next())
    b
  }

  override def eval(b: java.util.TreeSet[(Long, Double)]): Any = {
    val vals = new Array[Double](b.size)
    val it = b.iterator()
    var i = 0
    while (it.hasNext) { vals(i) = it.next()._2; i += 1 }
    java.util.Arrays.sort(vals)
    new GenericArrayData(vals.map(v => v: Any))
  }

  override def serialize(b: java.util.TreeSet[(Long, Double)]): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 16 * b.size)
    buf.putInt(b.size)
    val it = b.iterator()
    while (it.hasNext) { val (h, v) = it.next(); buf.putLong(h); buf.putDouble(v) }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, Double)] = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val b = new java.util.TreeSet[(Long, Double)](ord)
    var i = 0
    while (i < n) { b.add((buf.getLong, buf.getDouble)); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): BottomKSampleAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKSampleAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BottomKSampleAgg =
    copy(hashChild = c(0), valueChild = c(1))
}
