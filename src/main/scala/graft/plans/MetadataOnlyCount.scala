package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.sources.ManifestFileIndex

/** METADATA-ONLY COUNT(*) — the Delta "optimize metadata only query"
  * idea as a Catalyst rule: a bare, ungrouped, unfiltered `count(*)`
  * over a manifest-indexed relation is answered from the committed
  * `__rows` entries (stamped from parquet footers in the SAME flip as
  * the data, so never stale) instead of scheduling a scan. At 100 TB
  * that is the difference between one manifest GET and a full-table
  * file listing + scan for the pipeline's most common sanity probe.
  *
  * Conservative by construction, refusing anything whose answer could
  * differ from the scan:
  *  - only `count(literal)` aggregates (count(*) resolves to count(1));
  *    `count(col)` skips nulls — no match;
  *  - no grouping, no DISTINCT, no FILTER clause;
  *  - the child must be the relation itself through pure column-pruning
  *    projections (a Filter node breaks the chain — filtered counts
  *    scan);
  *  - the FileIndex answers None (missing `__rows` stamps, or pending
  *    MoR sidecars that change the presented count) — no match. When
  *    sidecars pend the plan shape already differs (the read seam
  *    composes anti-join/union ABOVE the relation), so the bare pattern
  *    cannot misfire there either.
  */
object MetadataOnlyCount extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case agg: Aggregate if agg.groupingExpressions.isEmpty &&
        agg.aggregateExpressions.nonEmpty &&
        agg.aggregateExpressions.forall(isPlainCount) =>
      baseCount(agg.child) match {
        case Some(n) =>
          LocalRelation(agg.output.map(_.toAttribute),
            Seq(InternalRow.fromSeq(Seq.fill(agg.output.size)(n))))
        case None => agg
      }
  }

  private def isPlainCount(e: NamedExpression): Boolean = e match {
    case Alias(ae: AggregateExpression, _) =>
      !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
        case Count(children) => children.forall {
          case l: Literal => l.value != null
          case _ => false
        }
        case _ => false
      })
    case _ => false
  }

  /** The provable row count of `child` if it is a manifest relation seen
    * through nothing but pure projections (attributes/aliases — the
    * shapes column pruning inserts). Anything else: None.
    */
  private def baseCount(child: LogicalPlan): Option[Long] = child match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation => fs.location match {
        case m: ManifestFileIndex => m.metadataRowCount
        case _ => None
      }
      case _ => None
    }
    case Project(pl, inner) if pl.forall {
        case _: Attribute => true
        case Alias(_: Attribute, _) => true
        case _ => false
      } => baseCount(inner)
    case _ => None
  }
}
