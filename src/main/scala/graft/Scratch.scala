package graft

import org.apache.spark.sql.SparkSession

/** Throwaway plan-inspection harness (dev only). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.sources.Tables.NanosAsLongConf, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[scratch] $name%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val q = SparkEntry.queries("ann_cosine_topk")(spark, dir)
    q.explain("formatted")
    time("ann_cosine_topk 1st") { q.write.format("noop").mode("overwrite").save() }
    time("ann_cosine_topk 2nd") { q.write.format("noop").mode("overwrite").save() }
    val e = SparkEntry.queries("dedup_embedding")(spark, dir)
    time("dedup_embedding") { e.write.format("noop").mode("overwrite").save() }
    val s = SparkEntry.queries("sim_join_jaccard")(spark, dir)
    time("sim_join 1st") { s.write.format("noop").mode("overwrite").save() }
    time("sim_join 2nd") { s.write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
