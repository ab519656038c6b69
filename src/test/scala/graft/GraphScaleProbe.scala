package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe behind the BASELINE.md "PageRank" row: per-round cost must
  * be linear in |E| and independent of the round count's position (no
  * lineage creep). Synthetic near-uniform directed graph with planted
  * hubs; `sbt "Test/runMain graft.GraphScaleProbe"`.
  */
object GraphScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def graph(e: Long) = {
      val v = e / 10
      // ~90% uniform endpoints + 10% funneled into 100 hub targets (the
      // skew a real link graph carries); dedup'd per the operator contract
      val base = spark.range(e).select(
        pmod(col("id"), lit(v)).as("src"),
        when(pmod(col("id"), lit(10L)) === 0, pmod(xxhash64(col("id")), lit(100L)))
          .otherwise(pmod(xxhash64(col("id")), lit(v))).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      base.union(base.select(col("dst").as("src"), col("src").as("dst")))
        .localCheckpoint(true)
    }

    for (e <- Seq(2000000L, 20000000L)) {
      val g = graph(e)
      val ne = g.count()
      for (iters <- Seq(5, 10); pass <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = graft.operators.Graph.pageRank(g, iters).count()
        println(f"[graph-scale] E=$ne iters=$iters pass=$pass nodes=$n " +
          f"${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
