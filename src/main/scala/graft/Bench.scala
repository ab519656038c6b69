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
    // (name, Option[(planSec, totalSec)]) — None iff every run of the query
    // threw: a failed run must never contribute its near-zero wall-time to
    // the best-of-2 minimum (that would mask the failure as a fast query)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val runs = (1 to 2).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          val df = fn(spark, sfDir)
          df.queryExecution.executedPlan
          val planSec = (System.nanoTime() - t0) / 1e9
          df.write.format("noop").mode("overwrite").save()
          Some((planSec, (System.nanoTime() - t0) / 1e9))
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          None
        }
      }
      (name, if (runs.isEmpty) None else Some(runs.minBy(_._2)))
    }
    def r3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def jmap(f: ((Double, Double)) => Double): String =
      results.map { case (n, b) =>
        "\"" + n + "\":" + b.map(t => r3(f(t))).getOrElse("null")
      }.mkString("{", ",", "}")
    val ok = results.flatMap(_._2)
    val total = ok.map(_._2).sum
    val planTotal = ok.map(_._1).sum
    val failed = results.collect { case (n, None) => "\"" + n + "\"" }
    // plan/exec split on its own line (diagnostic detail), then the compact
    // harness line LAST — values rounded to ms so the whole line stays small
    // enough to survive the driver's bounded tail capture and parse as JSON
    println(s"""{"detail":"plan_exec_split","plan_sec":${jmap(_._1)},"exec_sec":${jmap(t => t._2 - t._1)}}""")
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":${jmap(_._2)},"plan_total":${r3(planTotal)},"exec_total":${r3(total - planTotal)},"failed":[${failed.mkString(",")}],"sf":"$sfDir"}""")
    spark.stop()
  }
}
