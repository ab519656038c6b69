package graft

import org.apache.spark.sql.functions._

import graft.operators.Ann

/** Production-regime IVF-PQ measurement: the `IvfScaleProbe` corpus (1M
  * clustered vectors, 2048 true centers, dim 64) with the compressed
  * search path — coarse C=1024 with spill=2, 8-bit PQ codes (m=8), ADC
  * candidate scoring, exact re-rank of the refine·k short list. Records
  * recall@10 vs brute truth alongside what the compression buys: the
  * candidate join carries 8 int codes (≈8-32 B) per row instead of 64
  * doubles (512 B), on the same 1-3% scanned fraction the IVF probe
  * measured. Results pinned in BASELINE.md.
  *
  * Run: `sbt "Test/runMain graft.PqScaleProbe [n]"`.
  */
object PqScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val dim = 64
    val trueClusters = 2048
    val spark = TestSpark.spark
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    val centers = (0 until trueClusters).map { j =>
      val r = new scala.util.Random(1000L + j)
      val v = Array.fill(dim)(r.nextGaussian())
      val nrm = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / nrm)
    }.toArray
    val bcCenters = spark.sparkContext.broadcast(centers)
    val corpus = spark.range(n).as[Long].mapPartitions { it =>
      it.map { i =>
        val c = bcCenters.value((i % trueClusters).toInt)
        val r = new scala.util.Random(31L * i + 7L)
        val v = c.map(x => x + 0.15 * r.nextGaussian())
        val nrm = math.sqrt(v.map(x => x * x).sum)
        (i, v.map(x => (x / nrm).toFloat))
      }
    }.toDF("vec_id", "embedding").persist()
    println(s"[pqscale] corpus n=${corpus.count()} dim=$dim trueClusters=$trueClusters")

    val nQueries = 100
    val k = 10
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    var t0 = System.nanoTime()
    val brute = pairs(Ann.bruteTopK(corpus, nQueries, k))
    println(f"[pqscale] brute truth ${(System.nanoTime() - t0) / 1e9}%.0f s")

    val embCols = corpus.select(col("vec_id"),
      col("embedding").cast("array<double>").as("emb"))
    t0 = System.nanoTime()
    val cents = Ann.trainCentroids(embCols, 1024, lloydIters = 2)
    println(f"[pqscale] coarse C=1024 train ${(System.nanoTime() - t0) / 1e9}%.0f s")
    val queries = embCols.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    for (m <- Seq(8, 16); (spill, nprobe, refine) <- Seq((1, 8, 4), (1, 8, 10),
        (2, 16, 10), (2, 16, 25), (2, 16, 50))) {
      t0 = System.nanoTime()
      val pq = Ann.trainPq(embCols, m, 256)
      val trainSec = (System.nanoTime() - t0) / 1e9
      val enc = graft.functions.expr.VectorExpressions.pqEncode(col("emb"), pq.codebooks)
      t0 = System.nanoTime()
      val assigned = Ann.assignBucketsSpill(embCols, cents, spill)
        .select(col("vec_id"), col("bucket"), enc.as("codes")).persist()
      val probes = Ann.probesFor(queries, cents, nprobe)
        .withColumn("lut", graft.functions.expr.VectorExpressions
          .pqLutCosine(col("q_emb"), pq.codebooks))
        .select("q_id", "bucket", "lut")
      val adcAll = assigned.join(broadcast(probes), Seq("bucket"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"), graft.functions.expr
          .VectorExpressions.pqAdcCosine(col("codes"), col("lut"),
            pq.cwNorms2Flat, pq.ksub).as("cos"))
      val adc = if (spill > 1) adcAll.distinct() else adcAll
      val shortList = Ann.topKPerQuery(adc, refine * k).select("q_id", "vec_id")
      val rescored = embCols.join(broadcast(shortList), "vec_id")
        .join(broadcast(queries), "q_id")
        .select(col("q_id"), col("vec_id"),
          round(graft.functions.SimFns.cosine(col("emb"), col("q_emb")), 6).as("cos"))
      val got = pairs(Ann.topKPerQuery(rescored, k))
      val recall = brute.intersect(got).size.toDouble / brute.size
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[pqscale] m=$m spill=$spill nprobe=$nprobe refine=$refine recall@$k=$recall%.3f ${sec}%.0f s (train ${trainSec}%.0f s)")
      assigned.unpersist()
    }
    corpus.unpersist()
    spark.stop()
  }
}
