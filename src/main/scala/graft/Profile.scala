package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway measurement harness (dev only). */
object Profile {
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
      println(f"[profile] $name%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    val d = graft.sources.Tables.documents(spark, dir)
    import graft.functions.TextFns
    // stage-by-stage of jaccardJoin
    val sets = d.select(col("doc_id"), TextFns.shingleSet(col("text")).as("sh"))
      .withColumn("n", size(col("sh")))
    for (i <- 1 to 2) {
      time(s"sets #$i") { noop(sets) }
      val inv = sets.select(col("doc_id"), col("n"), explode(col("sh")).as("shingle"))
      time(s"inv #$i") { noop(inv) }
      val freq = inv.groupBy("shingle").agg(count(lit(1)).as("df"))
      time(s"freq #$i") { noop(freq) }
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))
      val prefixLen = col("n") - ceil(col("n") * 0.8).cast("int") + 1
      val prefix = inv.join(freq, "shingle")
        .withColumn("pos", row_number().over(w))
        .filter(col("pos") <= prefixLen)
        .select(col("doc_id"), col("shingle"))
      time(s"prefix #$i") { noop(prefix) }
      val candidates = prefix.as("a").join(prefix.as("b"), "shingle")
        .filter(col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      time(s"candidates #$i") { noop(candidates) }
      time(s"full join #$i") { noop(graft.operators.DedupApprox.jaccardJoin(d, 0.8)) }
      // count-based refine prototype: shared counts from the inverted index
      val refined = candidates
        .join(inv.select(col("doc_id").as("doc_a"), col("n").as("na"), col("shingle")), Seq("doc_a"))
        .join(inv.select(col("doc_id").as("doc_b"), col("n").as("nb"), col("shingle")), Seq("doc_b", "shingle"))
        .groupBy(col("doc_a"), col("doc_b"), col("na"), col("nb"))
        .agg(count(lit(1)).as("shared"))
        .withColumn("jaccard", graft.functions.FxMath.ratio(
          col("shared"), col("na").cast("long") + col("nb") - col("shared"), 4))
        .filter(col("jaccard") >= 0.8)
        .select("doc_a", "doc_b", "jaccard")
      time(s"count-refine full #$i") { noop(refined) }
    }
    spark.stop()
  }
}
