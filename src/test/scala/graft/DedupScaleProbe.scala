package graft

import org.apache.spark.sql.functions._

import graft.operators.{Components, DedupApprox}

/** Dev-only dedup-at-scale measurement (the text-family analog of
  * `IvfScaleProbe`): a deterministic synthetic corpus far beyond the sf
  * fixtures, with PLANTED near-dup structure — doc groups of 5 sharing a
  * 40-token splitmix64-random base: slot 0 verbatim, slots 1-2 with
  * exactly ONE token replaced (3-word-shingle Jaccard ≈ 0.85 → must be
  * found at t=0.8), slots 3-4 with TEN tokens replaced (J ≈ 0.4 → must
  * not be) — so exactness is checkable without an O(n²) oracle: every
  * exact pair must lie within a planted group. (A first version derived
  * base tokens AFFINELY from (group, position); every doc was then the
  * same arithmetic progression translated, groups overlapped almost
  * fully, and pair generation exploded — a useful reminder that
  * synthetic-corpus structure, not size, drives similarity-join cost.
  * splitmix64 avalanche kills the structure.)
  *
  * Timings are isolated from Spark's cache manager: the exact pair set is
  * materialized to parquet (not persisted), so later measurements can't
  * silently substitute an InMemoryRelation for their pair-generation
  * subtree. Results pinned in BASELINE.md.
  *
  * Run: `sbt "Test/runMain graft.DedupScaleProbe [nDocs]"`.
  */
object DedupScaleProbe {
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
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
          // offset by vocab so a mutation can never equal a base token
          toks(rnd.nextInt(docLen)) = vocab + rnd.nextInt(vocab)
          i += 1
        }
        (docId, toks.map(t => s"w$t").mkString(" "))
      }
    }.toDF("doc_id", "text").persist()
    println(s"[dedupscale] corpus n=${docs.count()} vocab=$vocab len=$docLen groups-of-5")

    def timed(name: String)(f: => Long): Long = {
      val t0 = System.nanoTime()
      val out = f
      println(f"[dedupscale] $name%-30s ${(System.nanoTime() - t0) / 1e9}%.1f s ($out rows)")
      out
    }

    val tmp = java.nio.file.Files.createTempDirectory("dedupscale").toString
    timed("ppjoin exact pairs (plain)") {
      DedupApprox.jaccardJoin(docs, 0.8)
        .write.mode("overwrite").parquet(s"$tmp/exact")
      spark.read.parquet(s"$tmp/exact").count()
    }
    val exact = spark.read.parquet(s"$tmp/exact")
    val nExact = exact.count()
    val crossGroup = exact
      .filter(expr("doc_a div 5") =!= expr("doc_b div 5")).count()
    println(s"[dedupscale] planted-structure check: cross-group exact pairs = $crossGroup (must be 0)")

    timed("ppjoin exact pairs (staged)") {
      val (p, release) = DedupApprox.jaccardJoinStaged(docs, 0.8)
      val c = p.count(); release(); c
    }

    val nMh = timed("minhash+refine pairs") {
      DedupApprox.minhashPairs(docs, 0.8)
        .write.mode("overwrite").parquet(s"$tmp/mh")
      spark.read.parquet(s"$tmp/mh").count()
    }
    val mh = spark.read.parquet(s"$tmp/mh")
    val extra = mh.select("doc_a", "doc_b").exceptAll(exact.select("doc_a", "doc_b")).count()
    println(f"[dedupscale] minhash recall=${nMh.toDouble / nExact}%.3f false-pairs=$extra (refine makes candidates exact)")

    timed("dedup_clusters end-to-end") {
      Components.dedupClusters(docs, 0.8).count()
    }
    docs.unpersist()
    spark.stop()
  }
}
