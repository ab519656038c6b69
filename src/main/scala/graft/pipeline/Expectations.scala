package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.{AtomicRenameCommitter, SnapshotCommitter}

/** Write-time data-quality EXPECTATIONS with row-level quarantine — the
  * complement of [[Upsert.addConstraint]]'s CHECK gate: a CHECK rejects the
  * WHOLE commit when any row violates (an invariant), an expectation
  * routes the violating ROWS to a quarantine table and lands the rest (a
  * filter with an audit trail — the "expect or drop with tracking" shape
  * pipeline frameworks ship). Per-rule semantics match SQL CHECK: a row
  * violates a rule only when the rule evaluates FALSE — NULL passes.
  *
  * Crash contract: the quarantine append commits FIRST, then the target
  * append — a crash between the two loses no rows (the quarantined rows
  * are durable; the batch's good rows simply haven't landed and the
  * batch retries). Retry semantics are at-least-once per batch; callers
  * needing exactly-once ride a batch-id ledger through `meta` the way the
  * streaming sinks do, and skip replayed batch ids before calling.
  *
  * Scale shape: one pass tags rows (`flagViolations` is a narrow
  * projection — no shuffle), persisted once and split by the tag; both
  * splits land via [[Upsert.appendTableAtomic]] (atomic manifest flips,
  * O(batch) written). Rule columns are ordinary Catalyst expressions —
  * codegen'd, pushdown-eligible.
  */
object Expectations {

  case class ExpectationStats(passed: Long, quarantined: Long)

  /** Tag every row with `failed_rules`: the alphabetically-sorted names
    * of the rules it violates (empty array = clean row). Only FALSE
    * violates — NULL passes, mirroring SQL CHECK.
    */
  def flagViolations(df: DataFrame, rules: Map[String, Column]): DataFrame = {
    require(rules.nonEmpty, "expectations need at least one rule")
    require(rules.keys.forall(_.matches("[A-Za-z0-9_-]+")),
      s"invalid rule name among ${rules.keys.mkString(",")}")
    val tags = rules.toSeq.sortBy(_._1).map { case (name, rule) =>
      when(coalesce(rule.cast("boolean"), lit(true)) === false, lit(name))
    }
    df.withColumn("failed_rules", array_compact(array(tags: _*)))
  }

  /** Split `data` by `rules`: clean rows append to `tablePath`, violating
    * rows (with a `failed_rules` CSV column naming what they broke)
    * append to `quarantinePath`. Returns the split counts.
    */
  def writeWithExpectations(spark: SparkSession, data: DataFrame,
                            tablePath: String, quarantinePath: String,
                            rules: Map[String, Column],
                            committer: SnapshotCommitter = AtomicRenameCommitter,
                            quarantineCommitter: SnapshotCommitter = AtomicRenameCommitter): ExpectationStats = {
    val flagged = flagViolations(data, rules).persist()
    try {
      val bad = flagged.filter(size(col("failed_rules")) > 0)
        .withColumn("failed_rules", array_join(col("failed_rules"), ","))
      val good = flagged.filter(size(col("failed_rules")) === 0)
        .drop("failed_rules")
      // quarantine first: a crash between the two appends must never have
      // silently dropped a violating row (see crash contract above)
      val nBad = bad.count()
      if (nBad > 0)
        Upsert.appendTableAtomic(spark, bad, quarantinePath,
          quarantineCommitter)
      val nGood = good.count()
      if (nGood > 0)
        Upsert.appendTableAtomic(spark, good, tablePath, committer)
      ExpectationStats(nGood, nBad)
    } finally flagged.unpersist()
  }
}
