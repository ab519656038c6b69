package graft

import org.apache.spark.sql.functions._

import graft.operators.Ann

/** Production-nlist IVF measurement: ~1M clustered synthetic vectors,
  * C=1024, nprobe ∈ {8,16}, spill ∈ {1,2} — the regime the `ivfTopK`
  * scaladoc claims (nprobe ≪ C, scanned fraction 1-2%, spill rescuing
  * boundary vectors). Records recall@10 vs brute truth AND the scanned
  * fraction (probed posting rows / corpus), the quantity that prices a
  * query at 100 TB. Results are pinned in BASELINE.md.
  *
  * Run: `sbt "Test/runMain graft.IvfScaleProbe [n] [dim] [trueClusters]"`.
  *
  * The corpus is cluster-structured on purpose (2048 unit-sphere centers,
  * gaussian sigma=0.15 around them): unlike the flat sf fixtures — where
  * recall tracks scanned volume almost linearly — this is the shape real
  * embedding corpora have, and the shape where IVF must beat coverage.
  */
object IvfScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val dim = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val trueClusters = args.drop(2).headOption.map(_.toInt).getOrElse(2048)
    val spark = TestSpark.spark
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    // deterministic clustered corpus: center_j ~ unit sphere (seed j),
    // vec_i = normalize(center_{i mod K} + N(0, 0.15))
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
    println(s"[ivfscale] corpus n=${corpus.count()} dim=$dim trueClusters=$trueClusters")

    val nQueries = 100
    val k = 10
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    var t0 = System.nanoTime()
    val brute = pairs(Ann.bruteTopK(corpus, nQueries, k))
    println(f"[ivfscale] brute truth ${(System.nanoTime() - t0) / 1e9}%.1f s (${brute.size} pairs)")

    val C = 1024
    val embCols = corpus.select(col("vec_id"),
      col("embedding").cast("array<double>").as("emb"))
    t0 = System.nanoTime()
    val cents = Ann.trainCentroids(embCols, C, lloydIters = 2)
    println(f"[ivfscale] train C=$C ${(System.nanoTime() - t0) / 1e9}%.1f s (${cents.length} centroids)")

    val queries = embCols.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    for (spill <- Seq(1, 2); nprobe <- Seq(8, 16)) {
      t0 = System.nanoTime()
      val assigned = Ann.assignBucketsSpill(embCols, cents, spill).persist()
      val sizes = assigned.groupBy("bucket").agg(count(lit(1)).as("bsz"))
      val probes = Ann.probesFor(queries, cents, nprobe)
      // scanned fraction: probed posting rows per query / corpus size
      val scanned = probes.join(sizes, "bucket")
        .groupBy("q_id").agg(sum("bsz").as("rows_scanned"))
        .agg(avg(col("rows_scanned")).as("avg_scanned")).head().getDouble(0)
      val ivf = pairs(Ann.scoreAndTopK(assigned, probes, k, dedupe = spill > 1))
      val recall = brute.intersect(ivf).size.toDouble / brute.size
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[ivfscale] C=$C spill=$spill nprobe=$nprobe recall@$k=$recall%.3f " +
        f"scanned=${scanned / n * 100}%.2f%% (${scanned}%.0f rows/query) ${sec}%.0f s")
      assigned.unpersist()
    }
    corpus.unpersist()
    spark.stop()
  }
}
