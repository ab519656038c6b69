package graft

import org.apache.spark.sql.functions._

import graft.operators.{DedupApprox, DedupIndex}

/** Scale measurement behind the BASELINE.md incremental-dedup row: the
  * same planted-structure synthetic corpus as `DedupScaleProbe` (groups
  * of 5 over splitmix64 bases), split 90% committed corpus / 10% arriving
  * batch. Compares the per-batch cost of the persisted-index probe
  * against re-running the whole-corpus exact prefix-filtered join (what a
  * non-incremental pipeline pays every cycle), and set-verifies the probe
  * against the whole-corpus pairs restricted to the batch (the probe's
  * candidate generator is itself exact since the frozen-order prefix
  * index, so the sets must be equal, not probabilistically close).
  *
  * Run: `sbt "Test/runMain graft.DedupIndexProbe [nDocs] [deltaMod]
  * [shBuckets] [docBuckets] [growFactor]"` — bucket pins of 0 (default)
  * take the index's own constant-volume auto-sizing; `growFactor > 1`
  * additionally measures the REBUCKET lifecycle: the index is grown to
  * ~growFactor× by corpus-sized appends (bucket counts frozen — the
  * per-bucket volume erosion `rebucketAdvised` watches), a FIXED
  * 1000-doc trickle batch is probed against the grown index, then
  * `rebucketIndex` restores the constant-volume layout and the same
  * batch re-probes — the pair sets must be identical (grown ≡
  * re-bucketed) while the probe cost returns to the sized contract
  * (⌈postings / [[DedupIndex.TargetRowsPerBucket]]⌉ clamped to
  * [[DedupIndex.MinBuckets]]..[[DedupIndex.MaxBuckets]]; √-sizing was
  * measured and rejected — see the DedupIndex scaladoc and BASELINE.md
  * r19).
  */
object DedupIndexProbe {
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val deltaMod = args.drop(1).headOption.map(_.toLong).getOrElse(10L)
    val spark = TestSpark.spark
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    val vocab = 20000
    val docLen = 40
    val docs = spark.range(n).select(col("id").as("doc_id")).mapPartitions { it =>
      it.map { row =>
        val docId = row.getLong(0)
        val g = docId / 5
        val slot = (docId % 5).toInt
        val base = Array.tabulate(docLen)(p =>
          math.floorMod(mix(g * docLen + p), vocab))
        val nMut = slot match {
          case 0 => 0
          case 1 | 2 => 1
          case _ => 10
        }
        val rnd = new scala.util.Random(31L * docId + 17L)
        val toks = base.clone()
        var i = 0
        while (i < nMut) {
          toks(rnd.nextInt(docLen)) = vocab + rnd.nextInt(vocab)
          i += 1
        }
        (docId, toks.map(t => s"w$t").mkString(" "))
      }
    }.toDF("doc_id", "text").persist()
    val corpus = docs.filter(pmod(col("doc_id"), lit(deltaMod)) =!= 0).persist()
    val delta = docs.filter(pmod(col("doc_id"), lit(deltaMod)) === 0).persist()
    println(s"[dedupidx] corpus=${corpus.count()} delta=${delta.count()}")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val out = f
      println(f"[dedupidx] $name%-34s ${(System.nanoTime() - t0) / 1e9}%.1f s")
      out
    }

    val shB = args.drop(2).headOption.map(_.toInt).getOrElse(0)
    val docB = args.drop(3).headOption.map(_.toInt).getOrElse(0)
    val idx = java.nio.file.Files.createTempDirectory("dedupidxprobe").toString
    timed("buildIndex (one-time, corpus)") {
      DedupIndex.buildIndex(corpus, idx, shB, docB)
    }
    println(s"[dedupidx] layout: " + spark.read.parquet(s"$idx/meta")
      .select("n_postings", "sh_buckets", "doc_buckets").head())
    val probed = timed("probeDelta (per batch)") {
      val p = DedupIndex.probeDelta(spark, idx, delta, 0.8)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      println(s"[dedupidx] probe pairs = ${p.size}")
      p
    }
    val whole = timed("whole-corpus jaccardJoin (per batch, non-incremental)") {
      val all = DedupApprox.jaccardJoin(docs, 0.8)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      println(s"[dedupidx] whole-corpus pairs = ${all.size}")
      all
    }
    val expected = whole.filter { case (a, b) =>
      a % deltaMod == 0 || b % deltaMod == 0 }
    println(s"[dedupidx] probe == whole-restricted-to-delta: ${probed == expected} " +
      s"(probe ${probed.size} vs expected ${expected.size})")

    val grow = args.drop(4).headOption.map(_.toInt).getOrElse(0)
    if (grow > 1) {
      // the same planted-structure generator over a shifted id range —
      // admitted batches are id-disjoint from the index AND the trickle
      def genDocs(lo: Long, count: Long) =
        spark.range(lo, lo + count).select(col("id").as("doc_id"))
          .mapPartitions { it =>
            it.map { row =>
              val docId = row.getLong(0)
              val g = docId / 5
              val slot = (docId % 5).toInt
              val base = Array.tabulate(docLen)(p =>
                math.floorMod(mix(g * docLen + p), vocab))
              val nMut = slot match {
                case 0 => 0
                case 1 | 2 => 1
                case _ => 10
              }
              val rnd = new scala.util.Random(31L * docId + 17L)
              val toks = base.clone()
              var i = 0
              while (i < nMut) {
                toks(rnd.nextInt(docLen)) = vocab + rnd.nextInt(vocab)
                i += 1
              }
              (docId, toks.map(t => s"w$t").mkString(" "))
            }
          }.toDF("doc_id", "text")
      (1 until grow).foreach { k =>
        timed(s"appendToIndex (corpus-sized round $k)") {
          DedupIndex.appendToIndex(genDocs(n * k, n), idx)
        }
      }
      println(s"[dedupidx] grown layout: " + spark.read.parquet(s"$idx/meta")
        .select("n_postings", "sh_buckets", "doc_buckets").head() +
        s" rebucketAdvised=${DedupIndex.rebucketAdvised(spark, idx)}")
      // two trickle shapes: 1k docs SATURATES the shingle buckets (the
      // documented full-scan-of-healthy-objects regime — rebucket keeps
      // per-object size healthy, wall-clock is index-scan-bound either
      // way), while 50 docs touches FEW doc buckets, where the restored
      // granularity prunes the candidate-doc refine read
      val trickle = genDocs(n * 100L, 1000L).persist()
      trickle.count()
      val micro = genDocs(n * 200L, 50L).persist()
      micro.count()
      def trickleProbe(batch: org.apache.spark.sql.DataFrame,
                       tag: String): Set[(Long, Long)] =
        timed(s"probeDelta ($tag)") {
          DedupIndex.probeDelta(spark, idx, batch, 0.8)
            .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
        }
      val grown = trickleProbe(trickle, "1k trickle, grown, pre-rebucket")
      val grownMicro = trickleProbe(micro, "50-doc micro, grown, pre-rebucket")
      timed("rebucketIndex (one-time OPTIMIZE)") {
        DedupIndex.rebucketIndex(spark, idx)
      }
      println(s"[dedupidx] rebucketed layout: " + spark.read
        .parquet(s"$idx/meta")
        .select("n_postings", "sh_buckets", "doc_buckets").head())
      val rebucketed = trickleProbe(trickle, "1k trickle, post-rebucket")
      val rebucketedMicro = trickleProbe(micro, "50-doc micro, post-rebucket")
      println(s"[dedupidx] grown == re-bucketed: " +
        s"${grown == rebucketed && grownMicro == rebucketedMicro} " +
        s"(${grown.size} + ${grownMicro.size} pairs)")
    }
    spark.stop()
  }
}
