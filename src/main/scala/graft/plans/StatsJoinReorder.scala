package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, EqualTo, ExprId, Expression, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.sources.ManifestFileIndex

/** STATS-DRIVEN JOIN REORDER — the System-R greedy ordering fed by the
  * engine's own committed `__stats` manifest metadata (ANALYZE TABLE's
  * exact rowcount + per-column NDV), not Spark's catalog stats: Spark's
  * CBO (`spark.sql.cbo.joinReorder.enabled`) never sees path-addressed
  * manifest tables, so multi-join chains over them execute in syntactic
  * order and only the broadcast decision ([[graft.pipeline.Upsert
  * .readTableCbo]]) is cost-based. This rule closes the gap for the plan
  * SHAPE: an inner-equi-join chain whose every leaf is a manifest
  * relation with fresh committed stats is rebuilt smallest-intermediate-
  * first, using |A ⋈ B| ≈ |A|·|B| / max(ndv_A(k), ndv_B(k)) per equality
  * conjunct (independence across conjuncts, ndv' = min(ndv, |est|) after
  * each step). At 100 TB the win is the classic one: joining the
  * selective dimension first can shrink the first shuffle by orders of
  * magnitude where a size-only heuristic (or syntactic order) carries
  * the full fact row count through every stage.
  *
  * Conservative gating — REORDER OR NOTHING, never a partial guess:
  *  - ≥3 relations, all joins INNER with no user join hints;
  *  - every leaf is a [[ManifestFileIndex]] relation carrying committed
  *    `__stats` (seen through the logical-rename / column-prune Projects
  *    the read path composes); a leaf-adjacent Filter participates with
  *    its selectivity estimated from the committed min/max (uniformity),
  *    1/NDV for point equality, and null fractions for IsNotNull guards
  *    — a selective filter on the big table can then beat an unfiltered
  *    small one; a MoR seam or any other node still breaks the chain and
  *    gates the rule off, since the committed rowcount no longer
  *    describes that input;
  *  - every join condition conjunct is attr = attr across two distinct
  *    relations, with NDV committed for both sides;
  *  - the join graph is connected (a deliberate cartesian is left alone);
  *  - the greedy order equal to the current order returns the plan
  *    unchanged (idempotent under the optimizer's fixpoint batch; greedy
  *    is prefix-stable, so rebuilt sub-chains are already in greedy
  *    order and re-matching them is a no-op).
  *
  * Estimates order the plan; they never touch results — the rebuilt tree
  * carries exactly the original conjuncts (each attached at the first
  * step where both its sides are present) and a final Project restores
  * the original output order.
  */
object StatsJoinReorder extends Rule[LogicalPlan] with PredicateHelper {

  /** A costed input: rowcount estimate, per-column NDV, plus — for
    * selectivity estimation on leaves — null counts and numeric value
    * ranges from the committed stats (empty past a filter; only the leaf
    * estimate consumes them).
    */
  private case class Rel(plan: LogicalPlan, rows: Double,
                         ndv: Map[ExprId, Long],
                         nulls: Map[ExprId, Long] = Map.empty,
                         range: Map[ExprId, (Double, Double)] = Map.empty)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case j @ Join(_, _, Inner, Some(_), hint) if hint == JoinHint.NONE =>
      reorder(j).getOrElse(j)
  }

  private def reorder(top: Join): Option[LogicalPlan] = {
    val (leaves, conds) = flatten(top)
    if (leaves.size < 3) return None
    val rels = leaves.map(leafStats)
    if (rels.exists(_.isEmpty)) return None
    val remaining = rels.flatten.toVector
    // every conjunct must be a two-relation equality with NDV both sides
    def sidesOf(c: Expression): Option[(ExprId, ExprId)] = c match {
      case EqualTo(a: Attribute, b: Attribute) => Some((a.exprId, b.exprId))
      case _ => None
    }
    val condSides = conds.map(sidesOf)
    if (condSides.exists(_.isEmpty)) return None
    val pairs = conds.zip(condSides.flatten)
    def ownerOf(id: ExprId, rs: Vector[Rel]): Option[Int] =
      rs.indexWhere(_.ndv.contains(id)) match { case -1 => None; case i => Some(i) }
    if (pairs.exists { case (_, (a, b)) =>
      val ra = ownerOf(a, remaining); val rb = ownerOf(b, remaining)
      ra.isEmpty || rb.isEmpty || ra == rb
    }) return None

    // est |L ⋈ R| over the conjuncts connecting them; None = disconnected
    def estJoin(l: Rel, r: Rel): Option[Double] = {
      val between = pairs.filter { case (_, (a, b)) =>
        (l.ndv.contains(a) && r.ndv.contains(b)) ||
          (l.ndv.contains(b) && r.ndv.contains(a))
      }
      if (between.isEmpty) None
      else Some(between.foldLeft(l.rows * r.rows) { case (acc, (_, (a, b))) =>
        val na = l.ndv.getOrElse(a, r.ndv(a)).toDouble
        val nb = l.ndv.getOrElse(b, r.ndv(b)).toDouble
        acc / math.max(1.0, math.max(na, nb))
      })
    }
    // each conjunct attaches at the FIRST step where both sides are
    // present; anything left at the end means the shape was not the
    // simple chain this rule handles — bail
    var unconsumed = pairs
    def consume(l: Rel, r: Rel): Seq[Expression] = {
      val (use, rest) = unconsumed.partition { case (_, (a, b)) =>
        (l.ndv.contains(a) || r.ndv.contains(a)) &&
          (l.ndv.contains(b) || r.ndv.contains(b))
      }
      unconsumed = rest
      use.map(_._1)
    }

    // greedy: cheapest connected pair first, then cheapest connected
    // extension; ties keep the earlier syntactic position (stable order)
    val firstPair = (for {
      i <- remaining.indices; j <- (i + 1) until remaining.size
      est <- estJoin(remaining(i), remaining(j))
    } yield (i, j, est)).sortBy { case (i, j, e) => (e, i, j) }.headOption
      .getOrElse(return None)
    val (li, ri, est0) = firstPair
    var orderIdx = Vector(li, ri)
    def build(l: Rel, r: Rel, est: Double): Rel = {
      val cond = consume(l, r).reduceOption[Expression](
        org.apache.spark.sql.catalyst.expressions.And(_, _))
      val ndv = (l.ndv ++ r.ndv).map { case (k, v) =>
        k -> math.min(v, math.max(1L, est.toLong))
      }
      Rel(Join(l.plan, r.plan, Inner, cond, JoinHint.NONE), est, ndv)
    }
    var current = build(remaining(li), remaining(ri), est0)
    var left = remaining.indices.filterNot(i => i == li || i == ri).toVector
    while (left.nonEmpty) {
      val next = left.flatMap(i =>
        estJoin(current, remaining(i)).map(e => (i, e)))
        .sortBy { case (i, e) => (e, i) }.headOption.getOrElse(return None)
      current = build(current, remaining(next._1), next._2)
      orderIdx = orderIdx :+ next._1
      left = left.filterNot(_ == next._1)
    }
    if (unconsumed.nonEmpty) return None // a conjunct never became attachable
    if (orderIdx == remaining.indices.toVector) return None // already greedy
    Some(Project(top.output, current.plan))
  }

  /** Adjacent hint-free inner joins flattened to (leaves, conjuncts).
    * Pure-ATTRIBUTE projections between joins (ColumnPruning's inserts)
    * are transparent — dropping them cannot orphan a condition, and the
    * next fixpoint iteration re-prunes the rebuilt tree; an ALIAS-bearing
    * intermediate projection is opaque (its output exprIds feed the
    * conditions above), which makes leafStats bail and gates the rule.
    */
  private def flatten(p: LogicalPlan): (Seq[LogicalPlan], Seq[Expression]) =
    p match {
      case Join(l, r, Inner, cond, hint) if hint == JoinHint.NONE =>
        val (ls, lc) = flatten(l); val (rs, rc) = flatten(r)
        (ls ++ rs,
          lc ++ rc ++ cond.toSeq.flatMap(splitConjunctivePredicates))
      case Project(pl, child) if pl.forall(_.isInstanceOf[Attribute]) &&
          child.isInstanceOf[Join] =>
        flatten(child)
      case other => (Seq(other), Nil)
    }

  /** Committed (rowcount, exprId → NDV) for a manifest-relation leaf seen
    * through pure projections — the rename/prune shapes the read path and
    * the optimizer insert. Alias(attr, name) maps the OUTPUT exprId to
    * the stats of the output (logical) name; a bare attribute keeps its
    * own name. Anything else (Filter, MoR seam, non-manifest source, no
    * committed stats): None, gating the whole reorder off.
    */
  private def leafStats(p: LogicalPlan): Option[Rel] = p match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation => fs.location match {
        case m: ManifestFileIndex => m.cboColStats.map { case (n, byName) =>
          def byId[T](f: graft.pipeline.Upsert.CboColStats => Option[T]): Map[ExprId, T] =
            lr.output.flatMap(a =>
              byName.get(a.name).flatMap(f).map(a.exprId -> _)).toMap
          Rel(lr, n.toDouble,
            ndv = byId(c => Some(c.ndv)),
            nulls = byId(c => Some(c.nulls)),
            range = byId(c => for {
              mn <- c.min.flatMap(s => s.toDoubleOption)
              mx <- c.max.flatMap(s => s.toDoubleOption)
            } yield (mn, mx)))
        }
        case _ => None
      }
      case _ => None
    }
    case prj @ Project(pl, inner) if pl.forall {
        case _: Attribute => true
        case Alias(_: Attribute, _) => true
        case _ => false
      } =>
      leafStats(inner).map { r =>
        def remap[T](src: Map[ExprId, T]): Map[ExprId, T] = pl.flatMap {
          case a: Attribute => src.get(a.exprId).map(a.exprId -> _)
          case al @ Alias(s: Attribute, _) =>
            // the logical rename: stats were committed under the OUTPUT
            // name, so re-key by it if present, else follow the source
            src.get(s.exprId).map(al.exprId -> _)
        }.toMap
        Rel(prj, r.rows, remap(r.ndv), remap(r.nulls), remap(r.range))
      }
    // a FILTERED manifest leaf participates with its selectivity
    // estimated from the committed stats (uniformity over [min,max] for
    // range conjuncts, 1/ndv for point equality, null fraction for the
    // optimizer's IsNotNull guards; anything unrecognized estimates 1.0
    // — conservative, never a gate): a selective filter on the big table
    // can legitimately beat an unfiltered small one, which a
    // rowcount-only cost can never see
    case f @ Filter(cond, inner) =>
      leafStats(inner).map { r =>
        val sel = splitConjunctivePredicates(cond)
          .map(selectivity(_, r)).product
        val est = math.max(1.0, r.rows * sel)
        // ranges/nulls deliberately NOT propagated: they describe the
        // unfiltered leaf, and only leaf-adjacent filters consume them
        Rel(f, est,
          r.ndv.map { case (k, v) => k -> math.min(v, math.max(1L, est.toLong)) })
      }
    case _ => None
  }

  /** Selectivity of one conjunct against a leaf's committed stats;
    * unrecognized shapes (or missing/non-numeric stats) estimate 1.0 —
    * the estimate can only shrink a filtered input, never inflate it.
    */
  private def selectivity(e: Expression, r: Rel): Double = {
    def clamp(x: Double) = math.min(1.0, math.max(0.0, x))
    def num(l: Literal): Option[Double] = l.value match {
      case null => None
      case n: Number => Some(n.doubleValue())
      case d: java.math.BigDecimal => Some(d.doubleValue())
      case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
      case _ => None
    }
    // fraction of [min,max] at or above v (uniformity; open/closed
    // boundary ignored — an estimate, not a result)
    def above(a: Attribute, v: Double): Double =
      r.range.get(a.exprId).fold(1.0) { case (mn, mx) =>
        if (mx <= mn) 1.0 else clamp((mx - v) / (mx - mn))
      }
    def below(a: Attribute, v: Double): Double =
      r.range.get(a.exprId).fold(1.0) { case (mn, mx) =>
        if (mx <= mn) 1.0 else clamp((v - mn) / (mx - mn))
      }
    e match {
      case IsNotNull(a: Attribute) =>
        r.nulls.get(a.exprId).fold(1.0)(n => clamp(1.0 - n / math.max(1.0, r.rows)))
      case EqualTo(a: Attribute, _: Literal) =>
        r.ndv.get(a.exprId).fold(1.0)(n => 1.0 / math.max(1L, n))
      case EqualTo(_: Literal, a: Attribute) =>
        r.ndv.get(a.exprId).fold(1.0)(n => 1.0 / math.max(1L, n))
      case GreaterThan(a: Attribute, l: Literal) => num(l).fold(1.0)(above(a, _))
      case GreaterThanOrEqual(a: Attribute, l: Literal) => num(l).fold(1.0)(above(a, _))
      case LessThan(a: Attribute, l: Literal) => num(l).fold(1.0)(below(a, _))
      case LessThanOrEqual(a: Attribute, l: Literal) => num(l).fold(1.0)(below(a, _))
      case GreaterThan(l: Literal, a: Attribute) => num(l).fold(1.0)(below(a, _))
      case GreaterThanOrEqual(l: Literal, a: Attribute) => num(l).fold(1.0)(below(a, _))
      case LessThan(l: Literal, a: Attribute) => num(l).fold(1.0)(above(a, _))
      case LessThanOrEqual(l: Literal, a: Attribute) => num(l).fold(1.0)(above(a, _))
      case _ => 1.0
    }
  }
}
