package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Runtime bloom-filter join pruning: when a shuffle join's build side is
  * made selective by a filter, Catalyst injects a `bloom_filter_agg` /
  * `might_contain` pair so the probe side drops non-joining rows at the
  * scan — at 100 TB this is the difference between shuffling the whole
  * fact and shuffling only rows that can match. The thresholds are tuned
  * down here because the fixture is far below the 10 GB production
  * defaults; the assertion is on the injected plan shape.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("selective shuffle join injects a bloom runtime filter on the probe side") {
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtimeFilter.number.threshold" -> "10",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val dir = "/root/testdata/sf0.01"
      val ord = Tables.orders(spark, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")
      val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy().agg(sum(col("l_quantity")))
      val optimized = j.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") ||
        optimized.contains("bloom_filter"), s"no runtime filter in:\n$optimized")
      // and the filtered plan still computes the same result
      val expected = Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir)
          .filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"), "left_semi")
        .agg(sum(col("l_quantity"))).first().getDouble(0)
      assert(j.first().getDouble(0) == expected)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
