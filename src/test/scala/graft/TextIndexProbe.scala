package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval

/** Scale measurement behind the BASELINE.md BM25-index row: does the
  * persisted text index's probe cost stay SUBLINEAR in index size at a
  * realistic multi-query workload (100+ distinct terms — far past the
  * point a small fixed bucket count saturates)? With √postings bucket
  * sizing a q-term probe reads O(q·√postings) of the postings, so probe
  * time between a corpus and its 4× copy should scale ≈ 2×, not 4×.
  * Also asserts index answers ≡ inline [[Retrieval.bm25TopK]] at each
  * size (exact integer scores, so equality is set equality).
  *
  * Run: `sbt "Test/runMain graft.TextIndexProbe [nDocs]"`.
  */
object TextIndexProbe {
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

    val docLen = 40
    def corpusOf(nDocs: Long) = {
      // vocab scales with the corpus so per-token posting lists stay
      // bounded-realistic instead of every token going corpus-hot
      val vocab = math.max(20000L, nDocs / 5)
      spark.range(nDocs).select(col("id").as("doc_id")).mapPartitions { it =>
        it.map { row =>
          val docId = row.getLong(0)
          val toks = Array.tabulate(docLen)(p =>
            s"w${math.floorMod(mix(docId * docLen + p), vocab)}")
          (docId, toks.mkString(" "))
        }
      }.toDF("doc_id", "text")
    }
    // 25 queries × ~6 tokens ≈ 150 distinct terms — the "realistic batch"
    // the round-17 verdict asked the saturation fix to be measured at;
    // terms drawn from the SMALL corpus's vocab so both sizes match docs
    val queries: Seq[(Long, String)] = (0L until 25L).map { q =>
      q -> (0 until 6).map(i =>
        s"w${math.floorMod(mix(q * 31 + i * 7 + 3), 20000L)}").mkString(" ")
    }

    def timed[T](name: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val out = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[textidx] $name%-40s $sec%.2f s")
      (out, sec)
    }

    def runAt(nDocs: Long): Double = {
      val docs = corpusOf(nDocs).persist()
      docs.count()
      val idx = java.nio.file.Files.createTempDirectory("textidxprobe").toString
      timed(s"buildTextIndex n=$nDocs (one-time)") {
        Retrieval.buildTextIndex(docs, idx)
      }
      val nBuckets = spark.read.parquet(s"$idx/stats")
        .select("n_buckets").head().getInt(0)
      println(s"[textidx] n=$nDocs auto buckets=$nBuckets")
      val (fromIdx, probeSec) = timed(s"bm25TopKFromIndex n=$nDocs (150-term)") {
        Retrieval.bm25TopKFromIndex(spark, idx, queries, 10)
          .as[(Long, Long, Long, Int)].collect().toSet
      }
      val (inline, _) = timed(s"bm25TopK inline n=$nDocs (reference)") {
        Retrieval.bm25TopK(docs, queries, 10)
          .as[(Long, Long, Long, Int)].collect().toSet
      }
      println(s"[textidx] index == inline at n=$nDocs: ${fromIdx == inline} " +
        s"(${fromIdx.size} rows)")
      docs.unpersist()
      probeSec
    }

    val small = runAt(n)
    val big = runAt(n * 4)
    println(f"[textidx] probe scaling at 4x corpus: ${big / small}%.2fx " +
      "(sublinear target < 4x; sqrt-sizing predicts ~2x)")
    spark.stop()
  }
}
