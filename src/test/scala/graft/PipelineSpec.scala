package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Pipeline

/** End-to-end pipeline: stage ordering, partitioned star layout, quality
  * gates, and idempotent re-runs (reference README.md:675-681).
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("pipeline runs end-to-end, lays out day partitions, re-runs idempotently") {
    val out = Files.createTempDirectory("graft-pipe").toString
    val r1 = Pipeline.run(spark, "/root/testdata/sf0.001", out)
    assert(r1.forall(_.rows > 0), s"empty stage in $r1")
    val star = r1.find(_.stage == "fact_events_star").get
    val fact = r1.find(_.stage == "fact_events").get
    assert(star.rows == fact.rows, "count parity (reference README.md:628-634)")

    // S4 physical layout: one directory per day partition
    val partDirs = new java.io.File(star.path).listFiles()
      .filter(_.getName.startsWith("date_key="))
    assert(partDirs.length > 25, s"expected ~30 day partitions, got ${partDirs.length}")

    // idempotency: overwrite snapshot rebuild converges (S3)
    val r2 = Pipeline.run(spark, "/root/testdata/sf0.001", out)
    assert(r1.map(s => s.stage -> s.rows) == r2.map(s => s.stage -> s.rows))

    // runtime partition pruning, not just plan text: a one-day predicate
    // must READ only that day's files — FileSourceScanExec's numFiles
    // metric after execution, the same evidence BigQuery surfaces as
    // bytes-scanned for its day-partitioned fact (reference README.md:598)
    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      df.queryExecution.toRdd.count() // finalize THIS QueryExecution's plan
      val p = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case other => other
      }
      p.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.head.metrics("numFiles").value
    }
    val oneKey = partDirs.head.getName.stripPrefix("date_key=").toLong
    val pruned = filesRead(spark.read.parquet(star.path)
      .filter(org.apache.spark.sql.functions.col("date_key") === oneKey))
    val full = filesRead(spark.read.parquet(star.path))
    assert(pruned * 10 <= full,
      s"one-day read touched $pruned of $full files — partition pruning not effective")

    // the star consumes MATERIALIZED stage outputs only: no Aggregate (a
    // dim's building aggregation) may appear anywhere in the star's
    // lineage — the plan shape OptimizeSkewedJoin needs to split a hot key
    // (Pipeline.starFromMaterialized scaladoc; measured in SkewStatefulSpec)
    val starPlan = Pipeline.starFromMaterialized(spark, out)
      .queryExecution.optimizedPlan
    val aggs = starPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.isEmpty,
      s"star inputs must be on-disk scans, found in-lineage aggregates:\n$starPlan")
  }

  test("pipeline_star_disk query scans the on-disk star with a static PartitionFilter") {
    // the oracled query (SparkEntry) answers a trailing-7-day question from
    // the pipeline's partitioned files; its scan must carry the cutoff as a
    // PartitionFilter — pruned days never opened
    val df = SparkEntry.queries("pipeline_star_disk")(spark, "/root/testdata/sf0.001")
    val scan = TestSpark.fileScanNodes(df.queryExecution.executedPlan).head
    val parts = scan.metadata("PartitionFilters")
    assert(parts.contains(">="),
      s"expected the 7-day cutoff as a PartitionFilter, got: $parts")
    df.queryExecution.toRdd.count()
    val nFiles = scan.metrics("numFiles").value
    val allParts = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft_star_disk_" +
        Integer.toHexString("/root/testdata/sf0.001".hashCode) + "/fact_events_star")
      .listFiles().count(_.getName.startsWith("date_key="))
    assert(nFiles <= 8 && allParts > 25,
      s"7-day read touched $nFiles files of $allParts partitions — not pruned")
  }

  test("bucketed star rebuild joins fact×dim_user with no shuffle exchange") {
    val out = Files.createTempDirectory("graft-bkt").toString
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force the undecorated user join to respect layout, not statistics —
    // the tiny dims keep their explicit broadcast() hints regardless
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val star = Pipeline.runBucketedStar(spark, "/root/testdata/sf0.001", out)
      val n = star.count()
      assert(n > 0 && n == spark.table("fact_events_bkt").count(),
        "star/fact count parity over the bucketed rebuild")
      val plan = star.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed star rebuild must be shuffle-free, got:\n$plan")
      assert(plan.contains("SortMergeJoin"),
        s"expected SMJ over co-located bucketed scans:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS fact_events_bkt")
      spark.sql("DROP TABLE IF EXISTS dim_user_bkt")
    }
  }

  test("generator is deterministic and in-distribution") {
    val g1 = graft.gen.VitalsGen.vitals(spark, 100, 1700000000L).collect()
    val g2 = graft.gen.VitalsGen.vitals(spark, 100, 1700000000L).collect()
    assert(g1.sameElements(g2))
    assert(g1.map(_.getAs[String]("patient_id")).toSet.subsetOf(Set("P001", "P002", "P003")))
    assert(g1.forall { r =>
      val v = r.getAs[Double]("value_num"); v >= 60.0 && v <= 100.0
    })
    assert(g1.map(_.getAs[String]("event_id")).distinct.length == 100)
  }
}
