package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** One shared local session for the whole forked test JVM. */
object TestSpark {

  /** Count FileSourceScanExec leaves, seeing through AQE: an
    * `AdaptiveSparkPlanExec` is itself a leaf node, so a naive
    * `collectLeaves` on an exchange-bearing plan finds zero scans.
    * Unwraps to the current finalized physical plan (and any nested
    * adaptive subtrees) before counting.
    */
  def fileScans(plan: SparkPlan): Int = fileScanNodes(plan).size

  /** All FileSourceScanExec nodes, unwrapping AQE subtrees (see above). */
  def fileScanNodes(plan: SparkPlan): Seq[FileSourceScanExec] = plan match {
    case a: AdaptiveSparkPlanExec => fileScanNodes(a.executedPlan)
    // materialized AQE stages are leaves wrapping the real subtree
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      fileScanNodes(q.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      fileScanNodes(r.child)
    case f: FileSourceScanExec    => Seq(f)
    case p                        => p.children.flatMap(fileScanNodes)
  }
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.sources.Tables.NanosAsLongConf, "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      // the simulated object-store schemes (ObjectStoreSim.scala): naf =
      // atomic-put / non-atomic-rename, hdfsl = non-local atomic-rename
      .config("spark.hadoop.fs.naf.impl", classOf[AtomicPutStoreFs].getName)
      .config("spark.hadoop.fs.AbstractFileSystem.naf.impl",
        classOf[AtomicPutStoreAbstractFs].getName)
      .config("spark.hadoop.fs.hdfsl.impl", classOf[HdfsLikeFs].getName)
      .config("spark.hadoop.fs.AbstractFileSystem.hdfsl.impl",
        classOf[HdfsLikeAbstractFs].getName)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
