package graft

import org.apache.spark.sql.catalyst.expressions.{Attribute, GreaterThan, LessThan, LessThanOrEqual}
import org.apache.spark.sql.catalyst.plans.logical._
import org.scalatest.funsuite.AnyFunSuite

/** Enforces the broadcast-hint policy documented in
  * [[graft.operators.Analytics]]: a `broadcast()` hint bypasses both the
  * planner's size check and AQE, so it may appear ONLY over subtrees whose
  * row count is O(1) or O(dims) in the scale factor — never over
  * customer/supplier/part/fact lineage that grows linearly with the data.
  * A violation here is the difference between "AQE degrades to a shuffle
  * join at 100 TB" and "the forced broadcast build OOMs at 100 TB".
  *
  * The walk is mechanical: every `ResolvedHint` node in every harness
  * query's analyzed plan must carry structural evidence of boundedness
  * (see [[boundedEvidence]]). Queries whose hinted side is bounded by an
  * EXTERNAL contract rather than plan structure are listed in
  * [[exceptions]] with the justification spelled out.
  */
class HintPolicySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Grouping keys whose cardinality is O(dims), not O(rows): nation and
    * region keys (25 / 5 values at every SF), the event-type enum, and
    * calendar-day keys (O(elapsed days), independent of row volume).
    */
  private val boundedKeys = Set(
    "n_name", "r_name", "n_nationkey", "n_regionkey", "r_regionkey",
    "event_type", "date_id", "date_key", "event_date", "lang")

  /** Structural evidence that `p` produces O(1)/O(dims) rows at any SF:
    *  1. a global (no-group-key) aggregate → exactly one row;
    *  2. a LIMIT → at most k rows;
    *  3. only driver-local leaves (LocalRelation/OneRowRelation) — model
    *     state like a collected vocab or centroid table;
    *  4. an aggregate grouped solely by bounded-cardinality dim keys;
    *  5. only nation/region scans as leaves (O(dims) tables);
    *  6. a filter pinning an id below/above a literal (`vec_id < 10`) —
    *     an absolute row bound independent of SF.
    */
  private def boundedEvidence(p: LogicalPlan): Boolean = {
    val globalAgg = p.exists {
      case a: Aggregate => a.groupingExpressions.isEmpty
      case _ => false
    }
    val limited = p.exists {
      case _: GlobalLimit | _: LocalLimit => true
      case _ => false
    }
    val leaves = p.collectLeaves()
    val driverLocal = leaves.nonEmpty && leaves.forall {
      case _: LocalRelation | _: OneRowRelation => true
      case _ => false
    }
    val dimKeyedAgg = p.exists {
      case a: Aggregate =>
        a.groupingExpressions.nonEmpty &&
          a.groupingExpressions.flatMap(_.references.toSeq)
            .forall(attr => boundedKeys.contains(attr.name))
      case _ => false
    }
    val dimOnlyLeaves = leaves.nonEmpty && leaves.forall { leaf =>
      val names = leaf.output.map(_.name)
      names.nonEmpty && names.forall(n => n.startsWith("n_") || n.startsWith("r_"))
    }
    val literalBoundFilter = p.exists {
      case Filter(cond, _) =>
        cond.exists {
          // the literal may arrive wrapped (cast(10 as bigint)) — foldable
          // covers any constant expression
          case LessThan(_: Attribute, r) => r.foldable
          case LessThanOrEqual(_: Attribute, r) => r.foldable
          case GreaterThan(l, _: Attribute) => l.foldable
          case _ => false
        }
      case _ => false
    }
    globalAgg || limited || driverLocal || dimKeyedAgg || dimOnlyLeaves ||
      literalBoundFilter
  }

  /** Queries whose hinted side is bounded by contract, not plan shape:
    *  - dedup_embedding is the deliberately-quadratic oracle baseline and
    *    REFUSES inputs > 100k rows (Ann.embeddingNearDup's guard), so its
    *    broadcast side is input-capped; the LSH path is the scale story.
    *  - star_bucketed_disk broadcasts the MATERIALIZED event-type/date
    *    dims (plain parquet scans of tables the same query just wrote from
    *    dim-keyed aggregates — O(|event types|) / O(days) by
    *    construction). The structural evidence lives in the writer's
    *    lineage, which the disk round trip deliberately severs: that
    *    severing is the pipeline's no-aggregate-in-lineage contract
    *    (dims land before the star reads them), the same reason
    *    `Pipeline.run`'s star is built from materialized dims.
    *
    * doc_contamination / doc_decontaminated used to sit here (their
    * broadcast eval side was bounded only by a scaladoc contract); since
    * TextOps.contamination gained its runtime fence + plan-level limit,
    * their hints carry structural evidence and the walk verifies them like
    * any other query.
    */
  private val exceptions = Set("dedup_embedding", "star_bucketed_disk")

  test("every broadcast hint sits over an O(1)/O(dims) subtree") {
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, _) if exceptions.contains(name) => Nil
      case (name, build) =>
        val plan = build(spark, dir).queryExecution.analyzed
        plan.collect {
          case h: ResolvedHint if !boundedEvidence(h.child) =>
            s"$name: broadcast hint over unbounded subtree:\n${h.child.treeString}"
        }
    }
    assert(violations.isEmpty, violations.mkString("\n\n"))
  }

  test("no unresolved hints survive analysis (hints all reach the planner)") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, build) =>
      val plan = build(spark, dir).queryExecution.analyzed
      assert(!plan.exists(_.isInstanceOf[UnresolvedHint]),
        s"$name: UnresolvedHint survived analysis")
    }
  }

  /** The inverse guard: the scale-growing relations must never appear as
    * hint targets without boundedness evidence anywhere in the suite —
    * this is the regression the round-5 sweep removed (forced broadcasts
    * of full customer/supplier/part in q3/q5/q10/q17/q19).
    */
  test("customer/supplier/part/lineitem/orders never hinted raw") {
    val growingCols =
      Set("c_custkey", "s_suppkey", "p_partkey", "l_orderkey", "o_orderkey")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, _) if exceptions.contains(name) => Nil
      case (name, build) =>
        val plan = build(spark, dir).queryExecution.analyzed
        plan.collect {
          // a hint whose child still exposes a raw fact/linear-dim key
          // column AND shows no boundedness evidence is a forced broadcast
          // of a scale-growing side
          case h: ResolvedHint
            if h.child.output.exists(a => growingCols.contains(a.name)) &&
              !boundedEvidence(h.child) =>
            s"$name hints a scale-growing relation (${h.child.output.map(_.name).mkString(", ")})"
        }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
