package graft

import org.apache.spark.sql.functions._

import graft.operators.Ann

/** Dev-only IVF-PQ parameter sweep: recall@5 vs brute across
  * (ksub, refine) at both fixture scale factors, plus the raw ADC error
  * profile — the measurement behind the pinned ivfPqTopK defaults.
  * Run: `sbt "Test/runMain graft.PqSweep"`.
  */
object PqSweep {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("sf0.001", "sf0.1")) {
      val emb = graft.sources.Tables.embeddings(spark, s"/root/testdata/$sf")
      def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
      val brute = pairs(Ann.bruteTopK(emb, 10, 5))
      for (ksub <- Seq(16, 64, 256); refine <- Seq(4, 10, 20)) {
        val t0 = System.nanoTime()
        val pq = pairs(Ann.ivfPqTopK(emb, 10, 5, ksub = ksub, refine = refine))
        val recall = brute.intersect(pq).size.toDouble / brute.size
        println(f"[pqsweep] $sf ksub=$ksub%3d refine=$refine%2d recall@5=$recall%.2f ${(System.nanoTime()-t0)/1e9}%.1f s")
      }
      // ADC error profile at each ksub
      val corpus = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      for (ksub <- Seq(16, 64, 256)) {
        val model = Ann.trainPq(corpus, 8, ksub)
        val enc = graft.functions.expr.VectorExpressions.pqEncode(col("emb"), model.codebooks)
        val q = corpus.filter(col("vec_id") < 1)
          .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
          .withColumn("lut", graft.functions.expr.VectorExpressions.pqLutCosine(col("q_emb"), model.codebooks))
        val err = corpus.select(col("vec_id"), enc.as("codes"), col("emb"))
          .crossJoin(broadcast(q))
          .select(abs(graft.functions.expr.VectorExpressions.pqAdcCosine(
            col("codes"), col("lut"), model.cwNorms2Flat, model.ksub) -
            graft.functions.SimFns.cosine(col("emb"), col("q_emb"))).as("e"))
          .agg(avg("e"), max("e")).head()
        println(f"[pqsweep] $sf ksub=$ksub%3d adc err avg=${err.getDouble(0)}%.3f max=${err.getDouble(1)}%.3f")
      }
    }
    spark.stop()
  }
}
