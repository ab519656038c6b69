package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bucketing: pre-partitioned tables joined on the bucket key need no
  * shuffle — the co-located-join layout the engine prescribes for repeated
  * big-big joins at scale (SURVEY.md §4; builder scale list).
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("join on the bucket key runs without any shuffle exchange") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val dir = "/root/testdata/sf0.001"
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
      graft.sources.Tables.lineitem(spark, dir)
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
      graft.sources.Tables.orders(spark, dir)
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("ord_bucketed")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          org.apache.spark.sql.functions.col("l_orderkey") ===
            org.apache.spark.sql.functions.col("o_orderkey"))
      assert(joined.count() > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free bucketed join, got:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ over bucketed scans:\n$plan")

      // runtime evidence, not just plan text: task metrics must show ZERO
      // shuffle bytes written for the bucketed join, while the identical
      // join over the raw (unbucketed) tables shuffles real bytes. The
      // measurement is scoped to the ACTION's OWN jobs via a unique job
      // group (onJobStart registers the group's stage ids; onTaskEnd counts
      // only those stages) — a session-global count would attribute any
      // straggler task from a preceding job or concurrent spec to this
      // action and break the ==0 assertion intermittently. Listener
      // delivery is async (the bus has no public drain), so poll until the
      // counter is stable for a grace period; the shuffling CONTROL runs
      // FIRST — its nonzero reading proves events flow before the bucketed
      // zero is trusted.
      def shuffleBytesOf(action: => Unit): Long = {
        val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
        val stages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
        val group = s"bucketing-measure-${java.util.UUID.randomUUID()}"
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            if (js.properties != null &&
                group == js.properties.getProperty("spark.jobGroup.id"))
              js.stageIds.foreach(id => stages.add(id))
          override def onTaskEnd(
              te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
            if (stages.contains(te.stageId) && te.taskMetrics != null)
              bytes.addAndGet(te.taskMetrics.shuffleWriteMetrics.bytesWritten)
        }
        spark.sparkContext.addSparkListener(listener)
        try {
          spark.sparkContext.setJobGroup(group, "shuffle-bytes measurement")
          try action finally spark.sparkContext.clearJobGroup()
          var last = -1L
          var stable = 0
          var waited = 0
          while (stable < 3 && waited < 100) { // stable = unchanged for 600 ms
            Thread.sleep(200)
            waited += 1
            if (bytes.get() == last) stable += 1 else { stable = 0; last = bytes.get() }
          }
        } finally spark.sparkContext.removeSparkListener(listener)
        bytes.get()
      }
      val raw = graft.sources.Tables.lineitem(spark, dir)
        .join(graft.sources.Tables.orders(spark, dir),
          org.apache.spark.sql.functions.col("l_orderkey") ===
            org.apache.spark.sql.functions.col("o_orderkey"))
      // materialize through the noop sink: count()'s own global aggregate
      // shuffles its per-partition partials (~½ KiB) and would pollute the
      // zero-shuffle reading
      def noop(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      val rawBytes = shuffleBytesOf(noop(raw))
      assert(rawBytes > 0L, "unbucketed control join should shuffle real bytes")
      val bucketedBytes = shuffleBytesOf(noop(joined))
      assert(bucketedBytes == 0L,
        s"bucketed join wrote $bucketedBytes shuffle bytes; layout not co-located")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
