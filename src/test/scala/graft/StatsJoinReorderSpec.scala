package graft

import java.nio.file.Files

import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Upsert
import graft.sources.ManifestTable
import graft.streaming.VersionedCommitter

/** Stats-driven join reorder: an inner-join chain over ANALYZEd manifest
  * tables is rebuilt smallest-intermediate-first from committed rowcount
  * × NDV — an ordering the size-only broadcast heuristic cannot see
  * (both dims here are broadcastable; only the ROW-COUNT of the first
  * intermediate distinguishes the orders). Results must be identical,
  * the plan must differ, and never-ANALYZEd tables must gate the rule
  * off entirely.
  */
class StatsJoinReorderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** fact(10k rows; k1 ndv 1000, k2 ndv 10) ⋈ dimB(k2, all 10 values —
    * non-selective) ⋈ dimA(k1, only 100 of the 1000 values — joining it
    * FIRST shrinks the intermediate 10×). Syntactic order joins dimB
    * first; the greedy System-R order is fact ⋈ dimA ⋈ dimB.
    */
  private def build(analyze: Boolean): (String, String, String, VersionedCommitter) = {
    val root = Files.createTempDirectory("graft-sjr").toString
    val c = new VersionedCommitter
    val fact = (0L until 10000L)
      .map(i => (i, i % 1000L, i % 10L, "all")).toDF("id", "k1", "k2", "p")
    val dimA = (0L until 100L).map(k => (k, s"a$k", "all")).toDF("k1", "a_name", "p")
    val dimB = (0L until 10L).map(k => (k, s"b$k", "all")).toDF("k2", "b_name", "p")
    val (fp, ap, bp) = (s"$root/fact", s"$root/dimA", s"$root/dimB")
    Seq((fact, fp), (dimA, ap), (dimB, bp)).foreach { case (df, p) =>
      Upsert.replacePartitionsAtomic(spark, df, p, "p", Seq("all"), committer = c)
      if (analyze) Upsert.analyzeTable(spark, p, c)
    }
    (fp, ap, bp, c)
  }

  private def chain(fp: String, ap: String, bp: String, c: VersionedCommitter) =
    ManifestTable.readTableIndexed(spark, fp, c).select("id", "k1", "k2")
      .join(ManifestTable.readTableIndexed(spark, bp, c).select("k2", "b_name"), "k2")
      .join(ManifestTable.readTableIndexed(spark, ap, c).select("k1", "a_name"), "k1")

  /** The columns referenced by the INNERMOST join's condition — which
    * relation got joined first.
    */
  private def innermostJoinKeys(plan: LogicalPlan): Set[String] = {
    val joins = plan.collect { case j: Join => j }
    val innermost = joins.filter(j => j.collect { case x: Join => x }.size == 1)
    innermost.flatMap(_.condition).flatMap(_.references.map(_.name)).toSet
  }

  test("ANALYZEd chain reorders to the selective dim first; results identical") {
    val (fp, ap, bp, c) = build(analyze = true)
    val q = chain(fp, ap, bp, c)
    val keys = innermostJoinKeys(q.queryExecution.optimizedPlan)
    assert(keys == Set("k1"),
      s"greedy order must join the selective dimA (k1) first, got keys $keys")
    // only rows whose k1 < 100 survive the selective dim; 10 per k1 × 100
    val rows = q.select("id", "a_name", "b_name").collect()
    assert(rows.length == 1000)
    val byId = rows.map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(byId(5L) == ("a5", "b5") && byId(1005L) == ("a5", "b5"))
    assert(!byId.contains(105L), "k1=105 has no dimA row — must not survive")
  }

  test("without committed stats the chain keeps its syntactic order") {
    val (fp, ap, bp, c) = build(analyze = false)
    val q = chain(fp, ap, bp, c)
    val keys = innermostJoinKeys(q.queryExecution.optimizedPlan)
    assert(keys == Set("k2"),
      s"never-ANALYZEd tables must gate the reorder off, got keys $keys")
    assert(q.count() == 1000L)
  }

  test("non-equi conjuncts and outer joins are left alone") {
    val (fp, ap, bp, c) = build(analyze = true)
    val f = ManifestTable.readTableIndexed(spark, fp, c).select("id", "k1", "k2")
    val a = ManifestTable.readTableIndexed(spark, ap, c).select(col("k1").as("ak1"), col("a_name"))
    val b = ManifestTable.readTableIndexed(spark, bp, c).select(col("k2").as("bk2"), col("b_name"))
    // range conjunct → bail (order unchanged: innermost joins b)
    val nonEqui = f.join(b, f("k2") === b("bk2") && f("id") > b("bk2"))
      .join(a, f("k1") === a("ak1"))
    val keys = innermostJoinKeys(nonEqui.queryExecution.optimizedPlan)
    assert(keys.contains("bk2") && !keys.contains("ak1"),
      s"a non-equi conjunct must gate the reorder off, got $keys")
    // left join → the rule never matches
    val outer = f.join(b, f("k2") === b("bk2"), "left")
      .join(a, f("k1") === a("ak1"))
    assert(outer.count() == 1000L)
  }

  /** Filter-selectivity fixture: a triangle join graph where the greedy
    * order on RAW rowcounts starts with the dim-dim edge, but a selective
    * range filter on the fact (committed min/max → uniformity estimate)
    * makes the filtered fact⋈B edge cheaper — the order must FLIP on the
    * filter alone.
    */
  private def buildTriangle(): (String, String, String, VersionedCommitter) = {
    val root = Files.createTempDirectory("graft-sjr3").toString
    val c = new VersionedCommitter
    val fact = (0L until 10000L)
      .map(i => (i, i % 100L, (i * 7L) % 100L, "all")).toDF("id", "x", "y", "p")
    val b = (0L until 1000L).map(i => (i % 100L, i % 50L, s"b$i", "all"))
      .toDF("x2", "z", "b_name", "p")
    val cc = (0L until 1000L).map(i => (i % 100L, i % 50L, s"c$i", "all"))
      .toDF("y2", "z2", "c_name", "p")
    val (fp, bp, cp) = (s"$root/fact", s"$root/b", s"$root/c")
    Seq((fact, fp), (b, bp), (cc, cp)).foreach { case (df, p) =>
      Upsert.replacePartitionsAtomic(spark, df, p, "p", Seq("all"), committer = c)
      Upsert.analyzeTable(spark, p, c)
    }
    (fp, bp, cp, c)
  }

  test("a selective range filter on the fact flips the greedy order") {
    val (fp, bp, cp, c) = buildTriangle()
    def chain(filtered: Boolean) = {
      val f0 = ManifestTable.readTableIndexed(spark, fp, c).select("id", "x", "y")
      val f = if (filtered) f0.filter(col("id") < 100) else f0
      val b = ManifestTable.readTableIndexed(spark, bp, c).select("x2", "z", "b_name")
      val cd = ManifestTable.readTableIndexed(spark, cp, c).select("y2", "z2", "c_name")
      f.join(b, col("x") === col("x2"))
        .join(cd, col("y") === col("y2") && col("z") === col("z2"))
    }
    // unfiltered: |B⋈C| ≈ 1000·1000/50 = 20k beats both fact edges (100k)
    // → the dim-dim edge joins first
    val rawKeys = innermostJoinKeys(chain(filtered = false).queryExecution.optimizedPlan)
    assert(rawKeys == Set("z", "z2"),
      s"raw rowcounts must start with the dim-dim edge, got $rawKeys")
    // id < 100 over committed [0, 9999] ⇒ sel ≈ 0.01 ⇒ fact' ≈ 100 rows ⇒
    // |fact'⋈B| ≈ 100·1000/100 = 1000 — the filtered fact edge now wins
    val q = chain(filtered = true)
    val filteredKeys = innermostJoinKeys(q.queryExecution.optimizedPlan)
    assert(filteredKeys == Set("x", "x2"),
      s"the selective filter must flip the greedy order, got $filteredKeys")
    // ordering is an estimate; the answer is exact and plan-independent
    val rows = q.select("id", "b_name", "c_name").collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(0) < 100L))
  }
}
