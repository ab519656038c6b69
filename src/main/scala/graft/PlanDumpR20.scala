package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Round-20 optimization evidence dumper: `explain("formatted")` for the
  * named queries into `plans/r20/<query>_<suffix>.txt`, under the SAME
  * session configuration as [[Bench]] (master/shuffle partitions from
  * `SPARK_GRAFT_CPUS`) so the dumped plans are the plans the bench actually
  * runs. Each query is EXECUTED first (noop-sink materialization, the bench
  * convention) and its own QueryExecution dumped, so adaptive plans are
  * FINAL (isFinalPlan=true: runtime broadcast choices, AQEShuffleRead
  * coalescing).
  *
  * Usage: runMain graft.PlanDumpR20 <before|after> <query>[,<query>...]
  */
object PlanDumpR20 {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: PlanDumpR20 <suffix> <q1,q2,...>")
    val suffix = args(0)
    val names = args(1).split(',').map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.sources.Tables.NanosAsLongConf, "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val outDir = Paths.get("plans/r20")
    Files.createDirectories(outDir)
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.queryExecution.toRdd.count()
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), plan)
      println(s"[plandump-r20] wrote ${name}_$suffix.txt")
    }
    spark.stop()
  }
}
