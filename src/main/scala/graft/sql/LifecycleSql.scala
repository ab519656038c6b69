package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types._

import graft.pipeline.{Maintenance, Upsert}
import graft.streaming.VersionedCommitter

/** SQL surface for the manifest-table lifecycle — the DDL-ish commands a
  * warehouse operator types, parsed by a [[ParserInterface]] injected via
  * `SparkSessionExtensions.injectParser`
  * ([[graft.plans.GraftExtensions]]) and executed as ordinary Spark
  * `RunnableCommand`s (eager, driver-side, returning rows — the same
  * machinery Spark's own DDL runs on):
  *
  * {{{
  *   DESCRIBE HISTORY '/path/to/table'
  *   RESTORE TABLE '/path/to/table' TO VERSION 3
  *   VACUUM '/path/to/table' KEEP 5
  *   CLONE '/path/src' TO '/path/dst' [AT VERSION 2]
  *   DESCRIBE DETAIL '/path/to/table'
  *   ANALYZE TABLE '/path/to/table' COMPUTE STATISTICS
  *   ANALYZE TABLE '/path/to/table' COMPUTE STATISTICS INCREMENTAL FOR COLUMNS a, b
  * }}}
  *
  * Tables are addressed by quoted path (these are path-based manifest
  * tables, not catalog entries), which also keeps the grammar disjoint
  * from Spark's own `ANALYZE TABLE ident` / `DESCRIBE` statements — any
  * statement this parser doesn't recognize delegates verbatim to Spark's
  * parser, so the full SQL surface stays intact underneath.
  */
object LifecycleSql {

  private def attr(name: String, dt: DataType): Attribute =
    AttributeReference(name, dt, nullable = true)()

  /** SQL statements carry no handle to the table owner's committer, so
    * they must not guess a retention smaller than the history already on
    * disk: a fresh default-retain committer on a table managed with
    * retain=30 would silently expire 20 versions at the first committing
    * statement. Size retain to cover every version currently committed
    * plus this command's own commit; fresh tables get the default.
    */
  private def committerFor(path: String): VersionedCommitter = {
    val existing = new VersionedCommitter().versions(path).size
    new VersionedCommitter(retain = math.max(10, existing + 1))
  }


  /** DESCRIBE DETAIL — the one-row operational summary (Delta's command
    * of the same name): current version, data partitions, file count and
    * bytes (from the manifest's own listing seam), exact row count when
    * the committed `__rows` stamps prove it without a scan (−1 when MoR
    * sidecars pend — a stale-looking number would be worse than none).
    */
  case class DescribeDetailCommand(path: String) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      attr("version", LongType), attr("n_partitions", LongType),
      attr("n_files", LongType), attr("size_bytes", LongType),
      attr("n_rows", LongType))
    override def run(spark: SparkSession): Seq[Row] = {
      val c = committerFor(path)
      val files = Maintenance.tableFileStats(path, c)
      val rows = Upsert.metadataRowCount(c.readManifest(path)).getOrElse(-1L)
      Seq(Row(c.versions(path).lastOption.getOrElse(0L),
        files.size.toLong, files.map(_.nFiles.toLong).sum,
        files.map(_.bytes).sum, rows))
    }
  }

  case class DescribeHistoryCommand(path: String) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      attr("version", LongType), attr("operation", StringType),
      attr("n_partitions", LongType), attr("n_rows", LongType))
    override def run(spark: SparkSession): Seq[Row] =
      Upsert.tableHistory(spark, path, committerFor(path)).collect().toSeq
  }

  case class RestoreTableCommand(path: String, version: Long)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      attr("restored_from", LongType), attr("new_version", LongType),
      attr("data_entries", LongType))
    override def run(spark: SparkSession): Seq[Row] = {
      val st = Upsert.restoreTable(path, version, committerFor(path))
      Seq(Row(st.restoredFrom, st.newVersion, st.dataEntries.toLong))
    }
  }

  case class VacuumTableCommand(path: String, keepLast: Int)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(attr("expired_version", LongType))
    override def run(spark: SparkSession): Seq[Row] =
      Maintenance.expireVersions(path, keepLast, committerFor(path)).map(Row(_))
  }

  case class CloneTableCommand(src: String, dst: String, version: Option[Long])
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      attr("src_version", LongType), attr("data_entries", LongType),
      attr("copied_bytes", LongType))
    override def run(spark: SparkSession): Seq[Row] = {
      val st = Upsert.cloneTable(src, dst, committerFor(src), version,
        committerFor(dst))
      Seq(Row(st.srcVersion, st.dataEntries.toLong, st.copiedBytes))
    }
  }

  /** INCREMENTAL form: per-partition sketches re-aggregated only for
    * content-changed partitions, merged stats committed under the same
    * keys ([[graft.pipeline.Upsert.analyzeTableIncremental]]) — the
    * O(change) stats cadence a 100-TB operator runs, exposed at the same
    * SQL front door as the exact form.
    */
  case class AnalyzeIncrementalCommand(path: String, cols: Seq[String])
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      attr("col_name", StringType), attr("n_rows", LongType),
      attr("n_nulls", LongType), attr("n_distinct", LongType),
      attr("min_s", StringType), attr("max_s", StringType))
    override def run(spark: SparkSession): Seq[Row] = {
      val st = Upsert.analyzeTableIncremental(spark, path,
        committerFor(path), cols).stats
      st.columns.map(c => Row(c.column, st.rowCount, c.nNulls, c.nDistinct,
        c.min.orNull, c.max.orNull))
    }
  }

  case class AnalyzeTableCommand(path: String) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      attr("col_name", StringType), attr("n_rows", LongType),
      attr("n_nulls", LongType), attr("n_distinct", LongType),
      attr("min_s", StringType), attr("max_s", StringType))
    override def run(spark: SparkSession): Seq[Row] = {
      val st = Upsert.analyzeTable(spark, path, committerFor(path))
      st.columns.map(c => Row(c.column, st.rowCount, c.nNulls, c.nDistinct,
        c.min.orNull, c.max.orNull))
    }
  }

  // quoted single-line path: no quote/newline inside (the manifest layer
  // enforces the same line discipline)
  private val P = "'([^'\\n]+)'"
  private val History = s"(?i)\\s*DESCRIBE\\s+HISTORY\\s+$P\\s*;?\\s*".r
  private val Detail = s"(?i)\\s*DESCRIBE\\s+DETAIL\\s+$P\\s*;?\\s*".r
  private val Restore = s"(?i)\\s*RESTORE\\s+TABLE\\s+$P\\s+TO\\s+VERSION\\s+(\\d+)\\s*;?\\s*".r
  private val Vacuum = s"(?i)\\s*VACUUM\\s+$P\\s+KEEP\\s+(\\d+)\\s*;?\\s*".r
  private val CloneAt = s"(?i)\\s*CLONE\\s+$P\\s+TO\\s+$P\\s+AT\\s+VERSION\\s+(\\d+)\\s*;?\\s*".r
  private val Clone = s"(?i)\\s*CLONE\\s+$P\\s+TO\\s+$P\\s*;?\\s*".r
  private val Analyze = s"(?i)\\s*ANALYZE\\s+TABLE\\s+$P\\s+COMPUTE\\s+STATISTICS\\s*;?\\s*".r
  private val AnalyzeIncr = s"(?i)\\s*ANALYZE\\s+TABLE\\s+$P\\s+COMPUTE\\s+STATISTICS\\s+INCREMENTAL\\s+FOR\\s+COLUMNS\\s+([A-Za-z0-9_,\\s]+?)\\s*;?\\s*".r

  /** The lifecycle command for `sqlText`, or None when it isn't one (the
    * caller delegates to Spark's parser).
    */
  def parse(sqlText: String): Option[LogicalPlan] = sqlText match {
    case History(p)        => Some(DescribeHistoryCommand(p))
    case Detail(p)         => Some(DescribeDetailCommand(p))
    case Restore(p, v)     => Some(RestoreTableCommand(p, v.toLong))
    case Vacuum(p, k)      => Some(VacuumTableCommand(p, k.toInt))
    case CloneAt(s, d, v)  => Some(CloneTableCommand(s, d, Some(v.toLong)))
    case Clone(s, d)       => Some(CloneTableCommand(s, d, None))
    case AnalyzeIncr(p, cs) => Some(AnalyzeIncrementalCommand(p,
      cs.split(",").map(_.trim).filter(_.nonEmpty).toSeq))
    case Analyze(p)        => Some(AnalyzeTableCommand(p))
    case _                 => None
  }
}

/** Delegating parser: lifecycle statements short-circuit to their
  * commands, everything else is Spark's SQL verbatim.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    LifecycleSql.parse(sqlText).getOrElse(delegate.parsePlan(sqlText))
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}
