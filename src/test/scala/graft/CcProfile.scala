package graft

import org.apache.spark.sql.functions._

import graft.operators.{Components, DedupApprox}
import graft.sources.Tables

/** Dev-only stage breakdown for `dedup_clusters` at sf0.1: times pair
  * generation, each label-propagation phase, and the cluster-size join
  * separately, and prints the round count — the numbers behind the
  * BASELINE.md trim decision (VERDICT r8 "next round" item 4).
  *
  * Run: `sbt "Test/runMain graft.CcProfile [sfDir]"`.
  */
object CcProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = TestSpark.spark
    spark.sparkContext.setLogLevel("WARN")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ccprof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = Tables.documents(spark, dir)
    val pairsPlan = DedupApprox.jaccardJoin(docs, 0.8)
    val reused = pairsPlan.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("ReusedExchange"))
    println(s"[ccprof] ReusedExchange nodes in pair plan: $reused")
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warmup (JIT + page cache), then alternate the two forms; min-of-N is
    // the contention-robust statistic
    val pairs = pairsPlan.select(col("doc_a").as("src"), col("doc_b").as("dst"))
    timed { pairs.write.format("noop").mode("overwrite").save() }
    timed { Components.dedupClusters(docs, 0.8).write.format("noop").mode("overwrite").save() }
    val plainT = collection.mutable.ArrayBuffer[Double]()
    val stagedT = collection.mutable.ArrayBuffer[Double]()
    val clustersT = collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to 5) {
      plainT += timed { pairs.write.format("noop").mode("overwrite").save() }
      stagedT += timed {
        val (p, release) = DedupApprox.jaccardJoinStaged(docs, 0.8)
        p.write.format("noop").mode("overwrite").save()
        release()
      }
      clustersT += timed {
        Components.dedupClusters(docs, 0.8).write.format("noop").mode("overwrite").save()
      }
    }
    def stats(n: String, xs: Seq[Double]): Unit =
      println(f"[ccprof] $n%-18s min ${xs.min}%.2f  med ${xs.sorted.apply(xs.size / 2)}%.2f  all ${xs.map(x => f"$x%.2f").mkString(" ")}")
    stats("pairs plain", plainT.toSeq)
    stats("pairs staged", stagedT.toSeq)
    stats("dedup_clusters", clustersT.toSeq)
    spark.stop()
  }
}
