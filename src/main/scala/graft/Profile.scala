package graft

import org.apache.spark.sql.SparkSession

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
    val d = graft.sources.Tables.documents(spark, dir)
    def pairs(df: org.apache.spark.sql.DataFrame) = {
      val cols = if (df.columns.contains("doc_a")) ("doc_a", "doc_b") else ("vec_a", "vec_b")
      df.select(cols._1, cols._2).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val exact = pairs(graft.operators.DedupApprox.jaccardJoin(d, 0.8))
    val mh = pairs(graft.operators.DedupApprox.minhashPairs(d, 0.5))
    val sh = pairs(graft.operators.DedupApprox.simhashPairs(d, 8))
    println(s"[profile] exact=${exact.size} minhash=${mh.size} mh_recall=${exact.intersect(mh).size.toDouble / exact.size}")
    println(s"[profile] simhash=${sh.size} sh_recall=${exact.intersect(sh).size.toDouble / exact.size}")

    val emb = graft.sources.Tables.embeddings(spark, dir)
    val exactE = pairs(graft.operators.Ann.embeddingNearDup(emb, 0.4))
    val lsh = pairs(graft.operators.Ann.embeddingNearDupLsh(emb, 0.4))
    println(s"[profile] embExact=${exactE.size} lsh=${lsh.size} lsh_recall=${exactE.intersect(lsh).size.toDouble / exactE.size} subset=${lsh.subsetOf(exactE)}")
    val exactE9 = pairs(graft.operators.Ann.embeddingNearDup(emb, 0.9))
    val lsh9 = pairs(graft.operators.Ann.embeddingNearDupLsh(emb, 0.9))
    println(s"[profile] embExact9=${exactE9.size} lsh9=${lsh9.size} recall9=${if (exactE9.nonEmpty) exactE9.intersect(lsh9).size.toDouble / exactE9.size else -1}")
    spark.stop()
  }
}
