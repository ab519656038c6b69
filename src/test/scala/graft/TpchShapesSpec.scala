package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Analytics

/** Invariants + plan shape for the round-4 TPC-H query additions
  * (q2/q4/q7/q8/q12/q14/q15/q21 shapes). Value-exactness is pinned by the
  * DuckDB oracle gate; these tests pin the semantics that the oracle hash
  * alone can't localize (per-query invariants and the physical join
  * strategies the 100 TB design depends on).
  */
class TpchShapesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  /** The q8/q14 plan assertions depend on AQE/the planner choosing to
    * broadcast the hint-free dim sides (the code deliberately carries no
    * hints on customer/supplier/part — see the Analytics broadcast-hint
    * policy). Pin the threshold those choices rest on so the assertions
    * encode intent rather than fixture-size-vs-default-10MB luck: if the
    * fixture grows or a session default changes, the test still exercises
    * the same planner decision.
    */
  private def withBroadcastThreshold[A](bytes: Long)(body: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, bytes.toString)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("q4: every priority bucket counts a subset of the window's orders") {
    val counts = Analytics.latePriorityOrders(spark, dir).collect()
    assert(counts.nonEmpty)
    val windowOrders = graft.sources.Tables.orders(spark, dir)
      .filter(org.apache.spark.sql.functions.col("o_orderdate")
        .between("1997-01-01", "1997-06-30 23:59:59")).count()
    assert(counts.map(_.getAs[Long]("order_count")).sum <= windowOrders)
    // semi join must not duplicate: priorities are distinct
    assert(counts.map(_.getString(0)).distinct.length == counts.length)
  }

  test("q7: only the two opposite nation pairs appear") {
    val rows = Analytics.nationTradeVolume(spark, dir).collect()
    assert(rows.nonEmpty)
    val pairs = rows.map(r => (r.getString(0), r.getString(1))).distinct.toSet
    assert(pairs.subsetOf(Set(("NATION_1", "NATION_2"), ("NATION_2", "NATION_1"))))
    val years = rows.map(_.getAs[Int]("l_year"))
    assert(years.forall(y => y == 1998 || y == 1999))
  }

  test("q8: market share is a valid ratio per year") {
    val rows = Analytics.marketShare(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val share = r.getAs[Double]("mkt_share")
      assert(share >= 0.0 && share <= 1.0)
    }
  }

  test("q8: fact side joins part/customer/supplier via broadcast (no fact-side extra shuffle)") {
    withBroadcastThreshold(10L * 1024 * 1024) {
      val plan = Analytics.marketShare(spark, dir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
      assert(plan.contains("BroadcastHashJoin"))
    }
  }

  test("q12: high + low counts add up to total late lines") {
    val rows = Analytics.lateLinesByStatus(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("high_line_count") >= 0L)
      assert(r.getAs[Long]("low_line_count") >= 0L)
      assert(r.getAs[Long]("high_line_count") + r.getAs[Long]("low_line_count") > 0L)
    }
  }

  test("q14: promo share is a percentage and the fact never shuffles") {
    withBroadcastThreshold(10L * 1024 * 1024) {
      val q = Analytics.promoRevenue(spark, dir)
      val r = q.collect().head
      val pct = r.getAs[Double]("promo_share_pct")
      assert(pct >= 0.0 && pct <= 100.0)
      assert(r.getAs[Long]("n_items") > 0L)
      // scan → broadcast join → single 1-row aggregate: the only Exchange is
      // the final 1-row SinglePartition combine, never a hash repartition
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("hashpartitioning"),
        s"q14 should not hash-shuffle the fact:\n$plan")
    }
  }

  test("q15: returned suppliers all hold the exact max revenue") {
    val rows = Analytics.topSupplier(spark, dir).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("total_revenue")).distinct
    assert(revs.length == 1, s"all rows must share the max revenue, got ${revs.toSeq}")
  }

  test("q21: semi+anti pair — every waiting supplier was late at least once") {
    val rows = Analytics.waitingSuppliers(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach(r => assert(r.getAs[Long]("numwait") > 0L))
    // deterministic order: numwait desc, then name
    val sorted = rows.sortBy(r => (-r.getAs[Long]("numwait"), r.getString(0)))
    assert(sorted.toSeq == rows.toSeq)
  }

  test("q2: per-region minimum is unique-per-region and truly minimal") {
    val rows = Analytics.minBalanceSuppliers(spark, dir).collect()
    assert(rows.nonEmpty)
    val spark2 = spark
    import org.apache.spark.sql.functions._
    val allMins = graft.sources.Tables.supplier(spark2, dir)
      .join(graft.sources.Tables.nation(spark2, dir),
        col("s_nationkey") === col("n_nationkey"))
      .join(graft.sources.Tables.region(spark2, dir),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name").agg(min("s_acctbal").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Double]("s_acctbal") == allMins(r.getString(0)))
    }
  }
}
