package graft

import graft.operators.Ann

/** Recall sweep for the IVF path vs brute across (numCentroids, nprobe,
  * lloydIters) — the measurement behind the pinned `ivfTopK` defaults and
  * the `AnnSpec` recall gate. Run: `sbt "Test/runMain graft.IvfSweep"`.
  */
object IvfSweep {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    for (sf <- Seq("0.001", "0.1")) {
      val emb = graft.sources.Tables.embeddings(spark, s"/root/testdata/sf$sf")
      val brute = pairs(Ann.bruteTopK(emb, 10, 5))
      for {
        c <- Seq(10)
        spill <- Seq(1, 2)
        nprobe <- Seq(5, 8)
        iters <- Seq(0, 1, 2, 4)
      } {
        val t0 = System.nanoTime()
        val ivf = pairs(Ann.ivfTopK(emb, 10, 5, numCentroids = c,
          nprobe = nprobe, lloydIters = iters, spill = spill))
        val recall = brute.intersect(ivf).size.toDouble / brute.size
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[sweep] sf=$sf C=$c%2d spill=$spill nprobe=$nprobe iters=$iters recall@5=$recall%.2f ${sec}%.1fs")
      }
    }
    spark.stop()
  }
}
