package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query seconds.
  * Each query is fully materialized through the `noop` sink (exercises the
  * whole plan incl. projections, unlike `count()` which lets Catalyst prune).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.sources.Tables.NanosAsLongConf, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (executor threads, codegen, parquet footer caches)
    // so per-query numbers measure the queries, not JVM startup
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    // per query: plan time (analyze+optimize+physical-plan, forced via
    // executedPlan) vs execution time (noop write) — at sf0.1 Catalyst
    // compile is a visible share of wall-time and would otherwise hide
    // execution regressions behind planning noise. Each query is measured
    // twice and the faster run reported: single-shot wall-times on a shared
    // VM vary up to ~2× under host CPU contention, and the minimum is the
    // steady-state capability number (same convention as the scale probes).
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        var planSec = 0.0
        try {
          val df = fn(spark, sfDir)
          df.queryExecution.executedPlan
          planSec = (System.nanoTime() - t0) / 1e9
          df.write.format("noop").mode("overwrite").save()
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (planSec, (System.nanoTime() - t0) / 1e9)
      }
      val best = runs.minBy(_._2)
      (name, best._1, best._2)
    }
    def jmap(f: ((String, Double, Double)) => Double): String =
      results.map(t => "\"" + t._1 + "\":" + f(t)).mkString("{", ",", "}")
    val qs = jmap(_._3)
    val plans = jmap(_._2)
    val execs = jmap(t => t._3 - t._2)
    val total = results.map(_._3).sum
    val planTotal = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"plan_sec":$plans,"exec_sec":$execs,"plan_total":$planTotal,"exec_total":${total - planTotal},"sf":"$sfDir"}""")
    spark.stop()
  }
}
