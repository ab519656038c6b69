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
    // calibration probe: a FIXED data-independent job (1e8-row hash-agg,
    // warm JVM, best of 3) whose cost depends only on host CPU speed and
    // contention. Readers normalize totals across runs by the calibration
    // ratio — r7's driver bench doubled on an unchanged suite purely from
    // host contention and only an out-of-band re-run disproved a
    // regression; this number makes that visible in the artifact itself.
    val calibrationSec = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      spark.range(100000000L)
        .selectExpr("sum(hash(id))", "count(distinct id % 1000)")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.min
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
    def r2(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    def jmap(fmt: Double => String)(f: ((Double, Double)) => Double): String =
      results.map { case (n, b) =>
        "\"" + n + "\":" + b.map(t => fmt(f(t))).getOrElse("null")
      }.mkString("{", ",", "}")
    val ok = results.flatMap(_._2)
    val total = ok.map(_._2).sum
    val planTotal = ok.map(_._1).sum
    val failed = results.collect { case (n, None) => "\"" + n + "\"" }
    // The driver's tail capture is bounded at 2000 chars, which is barely the
    // size of the 76-query compact line alone — a per-query plan/exec split
    // CANNOT physically fit beside it (measured: pairs-folded line ≈ 2350
    // chars incl. the sbt prefix and trailer). So the full detail goes to a
    // FILE in the repo (BENCH_DETAIL.json, pointed to from the surviving
    // compact line) and the stdout detail line stays as best-effort logging.
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL", "BENCH_DETAIL.json")
    val detailJson =
      s"""{"sf":"$sfDir","cpus":$cpus,"total_sec":${r3(total)},"plan_total_sec":${r3(planTotal)},"exec_total_sec":${r3(total - planTotal)},"calibration_sec":${r3(calibrationSec)},
         |"per_query":${results.map { case (n, b) =>
             "\"" + n + "\":" + b.map { case (p, t) =>
               s"""{"plan_sec":${r3(p)},"exec_sec":${r3(t - p)},"total_sec":${r3(t)}}"""
             }.getOrElse("null")
           }.mkString("{\n", ",\n", "}")},
         |"failed":[${failed.mkString(",")}]}""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get(detailPath),
      detailJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"""{"detail":"plan_exec_split","plan_sec":${jmap(r3)(_._1)},"exec_sec":${jmap(r3)(t => t._2 - t._1)}}""")
    // compact harness line LAST (inside the tail window): 2-decimal per-query
    // totals + a pointer to the detail file keep it under the 2000-char budget
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":${jmap(r2)(_._2)},"plan_total":${r3(planTotal)},"exec_total":${r3(total - planTotal)},"calibration_sec":${r3(calibrationSec)},"failed":[${failed.mkString(",")}],"detail":"$detailPath","sf":"$sfDir"}""")
    // At 92 queries the full compact line itself crossed the 2000-char tail
    // budget (measured 2074 chars at 87 queries — the per-query names alone
    // are ~1300 chars), so the line above can now lose its HEAD (metric/
    // value) to the tail window. The FINAL line therefore carries only the
    // 20 slowest queries (the triage set) and is ~700 chars — guaranteed to
    // survive intact; the complete per-query split lives in the detail file
    // committed with the repo.
    val slowest = results.collect { case (n, Some(b)) => (n, b) }
      .sortBy(-_._2._2).take(20)
      .map { case (n, (_, t)) => "\"" + n + "\":" + r2(t) }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$slowest,"n_queries":${results.size},"queries_note":"20 slowest of ${results.size}; full split in detail file","plan_total":${r3(planTotal)},"exec_total":${r3(total - planTotal)},"calibration_sec":${r3(calibrationSec)},"failed":[${failed.mkString(",")}],"detail":"$detailPath","sf":"$sfDir"}""")
    spark.stop()
  }
}
