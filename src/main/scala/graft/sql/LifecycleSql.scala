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
  *   SHOW PARTITIONS '/path/to/table'
  *   SHOW CONSTRAINTS '/path/to/table'
  * }}}
  *
  * and the DML statements the same operators type all day (the
  * reference's audience writes statements, not API calls —
  * `sql/bq_fact_vitals.sql:1`), mapping onto the engine's
  * partition-granular mutators; the partition column resolves from the
  * committed manifest, so no clause restates it:
  *
  * {{{
  *   DELETE FROM '/path' WHERE event_type = 'error'
  *   UPDATE '/path' SET value_cents = 0 WHERE event_type = 'error'
  *   MERGE INTO '/path' USING src_view ON KEYS (bucket, event_id)
  *     WHEN MATCHED AND __src_event_type = 'error' THEN DELETE
  *     WHEN MATCHED AND __src_event_type = 'purchase' THEN UPDATE SET value_cents = __src_value_cents
  *     WHEN NOT MATCHED THEN INSERT *
  *   OPTIMIZE '/path' [ZORDER BY (ts_us, user_id)]
  *   INSERT INTO '/path' SELECT …
  *   CREATE [OR REPLACE] TABLE '/path' [PARTITIONED BY (day)] AS SELECT …
  *   ALTER TABLE '/path' RENAME COLUMN a TO b | DROP COLUMN a
  *   ALTER TABLE '/path' ADD CONSTRAINT n CHECK (expr) | DROP CONSTRAINT n
  * }}}
  *
  * and the READ side of the same statement surface — quoted-path
  * relations in ordinary queries, optionally time-travel-pinned
  * (see [[LifecycleSql.rewritePathReads]]):
  *
  * {{{
  *   SELECT event_type, count(*) FROM '/path' VERSION AS OF 3 GROUP BY 1
  *   SELECT … FROM '/path/a' a JOIN '/path/b' b ON a.k = b.k
  *   SELECT * FROM CHANGES('/path', 2, 3)          -- the change feed
  * }}}
  *
  * MERGE conditions and SET expressions see [[Upsert.mergeInto]]'s
  * matched-pair view (target columns natural, source columns `__src_`-
  * prefixed) and `USING` takes a view name or a parenthesized SELECT.
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
    *
    * The INNER commit protocol follows the scheme: atomic-put object
    * stores ([[graft.streaming.TableFs.isAtomicPutScheme]]) get the
    * conditional-put slot-claim CAS ([[graft.streaming.ConditionalPutCommitter]]
    * — concurrent SQL writers lose loudly instead of tearing), everything
    * else the rename protocol. Layout mixing is guarded on both sides
    * (the conditional committer refuses a rename-layout table loudly).
    */
  private def committerFor(path: String): VersionedCommitter = {
    def fresh() = new VersionedCommitter(
      if (graft.streaming.TableFs.isAtomicPutScheme(path))
        new graft.streaming.ConditionalPutCommitter
      else graft.streaming.AtomicRenameCommitter)
    val existing = fresh().versions(path).size
    new VersionedCommitter(
      if (graft.streaming.TableFs.isAtomicPutScheme(path))
        new graft.streaming.ConditionalPutCommitter
      else graft.streaming.AtomicRenameCommitter,
      retain = math.max(10, existing + 1))
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

  // ---- DML statements over the same path-addressed tables ----
  // The partition column comes from the committed manifest (PartColKey),
  // so the grammar carries no redundant PARTITIONED BY clause; predicates
  // and SET expressions are Spark SQL, parsed at run time against the
  // table's presented (logical) schema.

  private def partColOf(path: String, c: VersionedCommitter): String =
    Upsert.partitionColumnOf(path, c).getOrElse(throw new IllegalArgumentException(
      s"'$path' is not a partitioned manifest table (no committed partition column)"))

  case class DeleteWhereCommand(path: String, predicateSql: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      attr("touched_partitions", StringType), attr("deleted_rows", LongType))
    override def run(spark: SparkSession): Seq[Row] = {
      val c = committerFor(path)
      val st = Upsert.deleteWhere(spark, path, partColOf(path, c),
        org.apache.spark.sql.functions.expr(predicateSql), c)
      Seq(Row(st.touchedPartitions.mkString(","), st.deletedRows))
    }
  }

  case class UpdateWhereCommand(path: String, setSql: Seq[(String, String)],
                                predicateSql: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      attr("touched_partitions", StringType), attr("updated_rows", LongType))
    override def run(spark: SparkSession): Seq[Row] = {
      val c = committerFor(path)
      val st = Upsert.updateWhere(spark, path, partColOf(path, c),
        org.apache.spark.sql.functions.expr(predicateSql),
        setSql.map { case (k, v) =>
          k -> org.apache.spark.sql.functions.expr(v) }.toMap, c)
      Seq(Row(st.touchedPartitions.mkString(","), st.updatedRows))
    }
  }

  /** `MERGE INTO '<path>' USING <source> ON KEYS (k, …) …` — `source` is
    * either a registered (temp) view name or a parenthesized SELECT; the
    * clause conditions and SET expressions see the engine's matched-pair
    * view: target columns at their natural names, source columns under
    * the `__src_` prefix ([[Upsert.mergeInto]]'s documented contract).
    * `delete`/`updateCond` are SQL texts (`Some("true")` = unconditional
    * delete clause); absent clauses are None/Nil.
    */
  case class MergeIntoCommand(path: String, source: String, keys: Seq[String],
                              delete: Option[String],
                              updateCond: Option[String],
                              setSql: Seq[(String, String)],
                              insertNotMatched: Boolean)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      attr("touched_partitions", StringType), attr("updated_rows", LongType),
      attr("deleted_rows", LongType), attr("inserted_rows", LongType))
    override def run(spark: SparkSession): Seq[Row] = {
      val c = committerFor(path)
      val src =
        if (source.startsWith("(")) spark.sql(source.stripPrefix("(").stripSuffix(")"))
        else spark.table(source)
      val st = Upsert.mergeInto(spark, path, partColOf(path, c), keys, src,
        deleteCond = delete.map(org.apache.spark.sql.functions.expr),
        updateCond = updateCond.map(org.apache.spark.sql.functions.expr),
        set = setSql.map { case (k, v) =>
          k -> org.apache.spark.sql.functions.expr(v) }.toMap,
        insertNotMatched = insertNotMatched, committer = c)
      Seq(Row(st.touchedPartitions.mkString(","), st.updatedRows,
        st.deletedRows, st.insertedRows))
    }
  }

  /** SHOW PARTITIONS '<path>' — the committed data partitions with their
    * footer-proved row stamps (−1 only for a partition that predates
    * stamping or that MoR sidecars pend on — sidecar keys encode their
    * partition, so the check is scoped per key, not table-wide). Refuses
    * a table with no committed partition column (a snapshot/log table's
    * 'all'/'append-<id>' data entries are storage layout, not
    * partitions). Metadata-only, no scan.
    */
  case class ShowPartitionsCommand(path: String) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      attr("partition", StringType), attr("n_rows", LongType))
    override def run(spark: SparkSession): Seq[Row] = {
      val c = committerFor(path)
      partColOf(path, c) // loud refusal on a non-partitioned table
      val m = c.readManifest(path)
      // a table can carry residual non-partition data entries from a
      // pre-partitioning layout ('all' snapshot, 'append-<id>' log) until
      // the next whole-table replace drops them — those are not values of
      // the partition column, so they are not SHOW PARTITIONS rows. They
      // are recognizable by carrying no per-partition row stamp AND
      // matching the reserved layout names. KNOWN EDGE: a GENUINE
      // partition whose value is literally 'all'/'append-<n>' AND that
      // was committed before row stamping existed (so it too is
      // stamp-less) is indistinguishable by this heuristic and is omitted
      // rather than listed at -1 — acceptable because current writers
      // always stamp (the collision requires both a reserved-name
      // partition VALUE and pre-stamping history), and one no-op
      // whole-table replace clears the ambiguity by dropping residual
      // layout entries and stamping everything.
      val layoutEntry = "^(all|append-[0-9]+)$".r
      m.filterNot(_._1.startsWith("__")).keys.toSeq.sorted
        .filterNot(p => layoutEntry.matches(p) &&
          !m.contains(s"${Upsert.RowsKeyPrefix}$p"))
        .map { p =>
          val pending = m.contains(s"__del.$p") || m.contains(s"__delta.$p")
          val rows =
            if (pending) -1L
            else m.get(s"${Upsert.RowsKeyPrefix}$p").map(_.toLong).getOrElse(-1L)
          Row(p, rows)
        }
    }
  }

  /** SHOW CATALOG '<path>' — the committed name → (table path, pinned
    * version) entries of a [[graft.pipeline.Catalog]] manifest: the
    * multi-table-transaction front door's listing, metadata-only. */
  case class ShowCatalogCommand(path: String) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      attr("name", StringType), attr("table_path", StringType),
      attr("pinned_version", LongType))
    override def run(spark: SparkSession): Seq[Row] =
      graft.pipeline.Catalog.pins(path, committerFor(path)).toSeq
        .sortBy(_._1)
        .map { case (n, pin) => Row(n, pin.tablePath, pin.version) }
  }

  /** SHOW CONSTRAINTS '<path>' — the committed CHECKs, name + SQL. */
  case class ShowConstraintsCommand(path: String) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      attr("name", StringType), attr("check_sql", StringType))
    override def run(spark: SparkSession): Seq[Row] =
      committerFor(path).readManifest(path).collect {
        case (k, v) if k.startsWith("__check.") =>
          Row(k.stripPrefix("__check."), v)
      }.toSeq.sortBy(_.getString(0))
  }

  /** ALTER TABLE '<path>' … — the metadata-only DDL the engine already
    * types: RENAME/DROP COLUMN are O(1) manifest commits (no data
    * rewrite; as-of reads keep the contemporaneous schema), ADD/DROP
    * CONSTRAINT manage write-time CHECKs (ADD validates existing rows
    * first, exactly like the API). One row back confirming the commit.
    */
  case class AlterTableCommand(path: String, action: String,
                               arg1: String, arg2: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      attr("action", StringType), attr("detail", StringType),
      attr("new_version", LongType))
    override def run(spark: SparkSession): Seq[Row] = {
      val c = committerFor(path)
      val detail = action match {
        case "rename_column" =>
          Upsert.renameColumn(path, arg1, arg2, c); s"$arg1 -> $arg2"
        case "drop_column" =>
          Upsert.dropColumn(path, arg1, c); arg1
        case "add_constraint" =>
          Upsert.addConstraint(spark, path, arg1, arg2, c); s"$arg1: $arg2"
        case "drop_constraint" =>
          Upsert.dropConstraint(path, arg1, c); arg1
      }
      Seq(Row(action, detail, c.versions(path).lastOption.getOrElse(0L)))
    }
  }

  /** INSERT INTO '<path>' <query> — atomic append to a log/ledger table
    * ([[Upsert.appendTableAtomic]]: CHECK constraints and the evolution
    * gate apply, one new manifest entry, existing entries untouched).
    * Partition-managed tables refuse (their write paths are keyed —
    * MERGE INTO / the upsert API — a blind multiset append would corrupt
    * keep-latest semantics); the appendTableAtomic precondition carries
    * the loud error. The inner query is ordinary Spark SQL parsed by
    * THIS parser, so `INSERT INTO '/a' SELECT … FROM '/b' VERSION AS OF
    * 2` composes. `inserted_rows` is metadata-proved (committed `__rows`
    * stamps before vs after), never a second execution of the query;
    * −1 when either side can't be proved.
    */
  case class InsertIntoCommand(path: String, querySql: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      attr("inserted_rows", LongType))
    override def run(spark: SparkSession): Seq[Row] = {
      val c = committerFor(path)
      val pre = Upsert.metadataRowCount(c.readManifest(path)).getOrElse(
        if (c.versions(path).isEmpty) 0L else -1L)
      Upsert.appendTableAtomic(spark, spark.sql(querySql), path, c)
      val post = Upsert.metadataRowCount(c.readManifest(path)).getOrElse(-1L)
      Seq(Row(if (pre >= 0 && post >= 0) post - pre else -1L))
    }
  }

  /** CREATE [OR REPLACE] TABLE '<path>' [PARTITIONED BY (col)] AS
    * <query> — the reference's own CTAS shape (bq_fact_vitals.sql:1)
    * over manifest tables: unpartitioned CTAS is one atomic snapshot
    * ([[Upsert.writeTableAtomic]]); PARTITIONED BY routes the result
    * through [[Upsert.replacePartitionsAtomic]] with the partition list
    * derived from the result itself (one distinct-collect, bounded by
    * partition count — the standard dynamic-partition-overwrite shape).
    * Without OR REPLACE an existing table refuses loudly.
    */
  case class CreateTableAsCommand(path: String, orReplace: Boolean,
                                  partitionBy: Option[String],
                                  querySql: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      attr("rows_written", LongType), attr("n_partitions", LongType))
    override def run(spark: SparkSession): Seq[Row] = {
      val c = committerFor(path)
      if (!orReplace && c.versions(path).nonEmpty)
        throw new IllegalArgumentException(
          s"table '$path' already exists — use CREATE OR REPLACE TABLE " +
            "to overwrite it (the previous versions stay time-travelable)")
      val df = spark.sql(querySql)
      partitionBy match {
        case Some(pc) =>
          df.persist()
          try {
            // REPLACE means the whole table: old data entries absent from
            // the new result land in the replace set with nothing staged,
            // so the commit drops them (the emptied-partition rule) —
            // otherwise stale partitions would survive the overwrite.
            // Old entries are manifest KEYS (Hive-escaped partition values,
            // or 'all'/'append-<id>' from a previous snapshot/log layout):
            // UNESCAPE them back to raw values before mixing them into the
            // replace list, or replacePartitionsAtomic's own escaping
            // would double-escape (partKey('a%20b') = 'a%2520b') and the
            // drop would miss the real key, leaving the stale partition
            // alive under the overwrite. Non-partition entries ('all',
            // 'append-<id>') unescape to themselves and are dropped by the
            // emptied-partition rule; a NEW partition value that happens
            // to equal such a key stages rows and simply wins the slot
            // (both covered in SqlLifecycleSpec).
            val old = c.readManifest(path).keys
              .filterNot(_.startsWith("__")).toSeq
              .map(org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
                .unescapePathName)
            val parts = (df.select(org.apache.spark.sql.functions
                .col(pc).cast("string")).distinct()
              .collect().map(_.getString(0)).toSeq ++ old).distinct.sorted
            Upsert.replacePartitionsAtomic(spark, df, path, pc, parts, c)
            val rows = Upsert.metadataRowCount(c.readManifest(path))
              .getOrElse(-1L)
            Seq(Row(rows, parts.size.toLong))
          } finally df.unpersist()
        case None =>
          Upsert.writeTableAtomic(spark, df, path, c)
          Seq(Row(Upsert.metadataRowCount(c.readManifest(path))
            .getOrElse(-1L), 1L))
      }
    }
  }

  case class OptimizeCommand(path: String, zorderCols: Seq[String])
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      attr("compacted_partitions", StringType), attr("files_before", LongType),
      attr("files_after", LongType), attr("bytes_rewritten", LongType))
    override def run(spark: SparkSession): Seq[Row] = {
      val st = Maintenance.compact(spark, path, zorderCols = zorderCols,
        committer = committerFor(path))
      Seq(Row(st.compacted.mkString(","), st.filesBefore, st.filesAfter,
        st.bytesRewritten))
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
  private val ShowParts = s"(?i)\\s*SHOW\\s+PARTITIONS\\s+$P\\s*;?\\s*".r
  private val ShowChecks = s"(?i)\\s*SHOW\\s+CONSTRAINTS\\s+$P\\s*;?\\s*".r
  private val ShowCat = s"(?i)\\s*SHOW\\s+CATALOG\\s+$P\\s*;?\\s*".r
  private val AnalyzeIncr = s"(?i)\\s*ANALYZE\\s+TABLE\\s+$P\\s+COMPUTE\\s+STATISTICS\\s+INCREMENTAL\\s+FOR\\s+COLUMNS\\s+([A-Za-z0-9_,\\s]+?)\\s*;?\\s*".r
  // DML over path-addressed tables ((?s): predicates/sources may span lines)
  private val Delete = s"(?is)\\s*DELETE\\s+FROM\\s+$P\\s+WHERE\\s+(.+?)\\s*;?\\s*".r
  // SET and WHERE are separated by the first TOP-LEVEL `WHERE` (keyword
  // scanner below), never by regex — a SET subquery's own WHERE must not
  // truncate the assignment list
  private val Update = s"(?is)\\s*UPDATE\\s+$P\\s+SET\\s+(.+?)\\s*;?\\s*".r
  private val Merge = s"(?is)\\s*MERGE\\s+INTO\\s+$P\\s+USING\\s+(.+?)\\s+ON\\s+KEYS\\s*\\(([^)]+)\\)\\s*(.*?)\\s*;?\\s*".r
  private val OptimizeZ = s"(?i)\\s*OPTIMIZE\\s+$P\\s+ZORDER\\s+BY\\s*\\(([A-Za-z0-9_,\\s]+)\\)\\s*;?\\s*".r
  private val Optimize = s"(?i)\\s*OPTIMIZE\\s+$P\\s*;?\\s*".r
  private val InsertInto = s"(?is)\\s*INSERT\\s+INTO\\s+$P\\s+(.+?)\\s*;?\\s*".r
  private val C = "([A-Za-z0-9_]+)"
  private val AlterRename =
    s"(?i)\\s*ALTER\\s+TABLE\\s+$P\\s+RENAME\\s+COLUMN\\s+$C\\s+TO\\s+$C\\s*;?\\s*".r
  private val AlterDropCol =
    s"(?i)\\s*ALTER\\s+TABLE\\s+$P\\s+DROP\\s+COLUMN\\s+$C\\s*;?\\s*".r
  private val AlterAddCheck =
    s"(?is)\\s*ALTER\\s+TABLE\\s+$P\\s+ADD\\s+CONSTRAINT\\s+$C\\s+CHECK\\s*\\((.+)\\)\\s*;?\\s*".r
  private val AlterDropCheck =
    s"(?i)\\s*ALTER\\s+TABLE\\s+$P\\s+DROP\\s+CONSTRAINT\\s+$C\\s*;?\\s*".r
  private val CreateTableAs =
    (s"(?is)\\s*CREATE\\s+(OR\\s+REPLACE\\s+)?TABLE\\s+$P\\s+" +
      "(?:PARTITIONED\\s+BY\\s*\\(\\s*([A-Za-z0-9_]+)\\s*\\)\\s+)?" +
      "AS\\s+(.+?)\\s*;?\\s*").r
  // a statement that LOOKS like graft DML (our verb + a quoted path) but
  // fails the grammar must error loudly here — delegating it to Spark
  // would produce a baffling parse error against the quoted path
  private val DmlNearMiss =
    ("(?is)\\s*(MERGE\\s+INTO|DELETE\\s+FROM|UPDATE|OPTIMIZE|INSERT\\s+INTO|" +
      "CREATE\\s+(?:OR\\s+REPLACE\\s+)?TABLE|ALTER\\s+TABLE)\\s+'.*").r

  // MERGE clause tail: WHEN-pieces in any order, each exactly one of the
  // three forms; an unconditional clause parses as condition "true"
  private val DelClause =
    "(?is)\\s*WHEN\\s+MATCHED\\s+(?:AND\\s+(.+?)\\s+)?THEN\\s+DELETE\\s*".r
  private val UpdClause =
    "(?is)\\s*WHEN\\s+MATCHED\\s+(?:AND\\s+(.+?)\\s+)?THEN\\s+UPDATE\\s+SET\\s+(.+?)\\s*".r
  private val InsClause = "(?is)\\s*WHEN\\s+NOT\\s+MATCHED\\s+THEN\\s+INSERT\\s+\\*\\s*".r

  /** Offsets of each TOP-LEVEL occurrence of keyword `kw` in `s`:
    * outside quotes, outside parens/brackets, and outside CASE…END
    * blocks — what lets a `CASE WHEN … THEN … END` inside a MERGE SET
    * expression (or a subquery's WHERE inside an UPDATE assignment)
    * pass through the statement grammar intact.
    */
  private def topLevelKeywordOffsets(s: String, kw: String): Seq[Int] = {
    val lower = s.toLowerCase(java.util.Locale.ROOT)
    val k = kw.toLowerCase(java.util.Locale.ROOT)
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    var depth = 0
    var caseDepth = 0
    var quote: Char = 0
    def isWordChar(c: Char) = c.isLetterOrDigit || c == '_'
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0; i += 1 }
      else c match {
        case '\'' | '"' => quote = c; i += 1
        case '(' | '['  => depth += 1; i += 1
        case ')' | ']'  => depth -= 1; i += 1
        case _ if isWordChar(c) && (i == 0 || !isWordChar(s.charAt(i - 1))) =>
          var j = i
          while (j < s.length && isWordChar(s.charAt(j))) j += 1
          val w = lower.substring(i, j)
          if (w == "case") caseDepth += 1
          else if (w == "end" && caseDepth > 0) caseDepth -= 1
          else if (w == k && depth == 0 && caseDepth == 0) out += i
          i = j
        case _ => i += 1
      }
    }
    out.toSeq
  }

  /** Split on TOP-LEVEL commas only (never inside parens, brackets, or
    * quotes) — SET lists carry arbitrary SQL expressions.
    */
  private def splitTop(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var quote: Char = 0
    s.foreach { ch =>
      if (quote != 0) { cur += ch; if (ch == quote) quote = 0 }
      else ch match {
        case '\'' | '"'        => quote = ch; cur += ch
        case '(' | '['         => depth += 1; cur += ch
        case ')' | ']'         => depth -= 1; cur += ch
        case ',' if depth == 0 => out += cur.toString; cur.clear()
        case c                 => cur += c
      }
    }
    out += cur.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  private val Assign = "(?s)\\s*([A-Za-z_][A-Za-z0-9_]*)\\s*=\\s*(.+)".r

  private def parseAssignments(s: String): Seq[(String, String)] =
    splitTop(s).map {
      case Assign(k, v) => k -> v.trim
      case bad => throw new IllegalArgumentException(
        s"malformed SET assignment '$bad' — expected <column> = <expression>")
    }

  private def parseMerge(path: String, source: String, keysCsv: String,
                         tail: String): MergeIntoCommand = {
    var delete: Option[String] = None
    var updateCond: Option[String] = None
    var hasUpdate = false
    var setSql: Seq[(String, String)] = Nil
    var insert = false
    // clause boundaries are the TOP-LEVEL `WHEN`s only — a CASE WHEN
    // inside a clause condition or SET expression stays in its piece
    val offs = topLevelKeywordOffsets(tail, "when")
    if (offs.isEmpty || tail.substring(0, offs.head).trim.nonEmpty)
      throw new IllegalArgumentException(
        "MERGE needs WHEN clauses after ON KEYS (…)")
    val pieces = offs.zipAll(offs.drop(1).map(Some(_)), 0, None).map {
      case (a, b) => tail.substring(a, b.getOrElse(tail.length))
    }
    // first-clause-wins would silently drop a duplicate; refuse syntax
    // the engine cannot express instead
    def once(already: Boolean, what: String): Unit =
      if (already) throw new IllegalArgumentException(
        s"duplicate MERGE $what clause — the engine evaluates one " +
          "condition per action (compose with OR / CASE instead)")
    pieces.foreach {
      case DelClause(cond) =>
        once(delete.isDefined, "DELETE")
        delete = Some(Option(cond).getOrElse("true"))
      case UpdClause(cond, set) =>
        once(hasUpdate, "UPDATE")
        hasUpdate = true; updateCond = Option(cond)
        setSql = parseAssignments(set)
      case InsClause() =>
        once(insert, "INSERT")
        insert = true
      case bad => throw new IllegalArgumentException(
        s"malformed MERGE clause '${bad.trim}' — expected WHEN MATCHED " +
          "[AND <cond>] THEN DELETE | WHEN MATCHED [AND <cond>] THEN " +
          "UPDATE SET <col> = <expr>, … | WHEN NOT MATCHED THEN INSERT *")
    }
    MergeIntoCommand(path, source.trim,
      keysCsv.split(",").map(_.trim).filter(_.nonEmpty).toSeq,
      delete, updateCond, setSql, insert)
  }

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
    case ShowParts(p)      => Some(ShowPartitionsCommand(p))
    case ShowChecks(p)     => Some(ShowConstraintsCommand(p))
    case ShowCat(p)        => Some(ShowCatalogCommand(p))
    case Delete(p, pred)   => Some(DeleteWhereCommand(p, pred))
    case Update(p, rest) =>
      // the statement's own WHERE is the first TOP-LEVEL one; a subquery
      // WHERE inside an assignment stays with its assignment
      val offs = topLevelKeywordOffsets(rest, "where")
      if (offs.isEmpty) throw new IllegalArgumentException(
        "UPDATE over a quoted table path needs a WHERE clause — " +
          "UPDATE '<path>' SET <col> = <expr>, … WHERE <pred>")
      Some(UpdateWhereCommand(p,
        parseAssignments(rest.substring(0, offs.head)),
        rest.substring(offs.head + "where".length).trim))
    case Merge(p, src, ks, tail) => Some(parseMerge(p, src, ks, tail))
    case OptimizeZ(p, cs)  => Some(OptimizeCommand(p,
      cs.split(",").map(_.trim).filter(_.nonEmpty).toSeq))
    case Optimize(p)       => Some(OptimizeCommand(p, Nil))
    case InsertInto(p, q)  => Some(InsertIntoCommand(p, q))
    case AlterRename(p, a, b) => Some(AlterTableCommand(p, "rename_column", a, b))
    case AlterDropCol(p, a)   => Some(AlterTableCommand(p, "drop_column", a, null))
    case AlterAddCheck(p, n, e) =>
      Some(AlterTableCommand(p, "add_constraint", n, e.trim))
    case AlterDropCheck(p, n) =>
      Some(AlterTableCommand(p, "drop_constraint", n, null))
    case CreateTableAs(rep, p, pc, q) =>
      Some(CreateTableAsCommand(p, rep != null, Option(pc), q))
    case DmlNearMiss(verb) => throw new IllegalArgumentException(
      s"malformed graft ${verb.toUpperCase.replaceAll("\\s+", " ")} statement " +
        "over a quoted table path — expected one of: DELETE FROM '<path>' " +
        "WHERE <pred> | UPDATE '<path>' SET <col> = <expr>, … WHERE <pred> | " +
        "MERGE INTO '<path>' USING <view|(SELECT …)> ON KEYS (k, …) WHEN … | " +
        "OPTIMIZE '<path>' [ZORDER BY (col, …)] | INSERT INTO '<path>' " +
        "<query> | CREATE [OR REPLACE] TABLE '<path>' [PARTITIONED BY " +
        "(col)] AS <query> | ALTER TABLE '<path>' RENAME COLUMN a TO b | " +
        "DROP COLUMN a | ADD CONSTRAINT n CHECK (<expr>) | DROP CONSTRAINT n")
    case _                 => None
  }

  private val QueryHead = "(?is)\\s*(?:select|with)\\b.*".r
  private val VersionClause =
    "(?is)\\s+version\\s+as\\s+of\\s+(\\d+)".r
  // integer epoch-ms OR a quoted date/timestamp literal (parsed as UTC
  // when zoneless) — a quoted form left unmatched would strand a dangling
  // "TIMESTAMP AS OF …" in the delegated text and surface as a baffling
  // parse error against the generated view name
  private val TimestampClause =
    "(?is)\\s+timestamp\\s+as\\s+of\\s+(?:(\\d+)|'([^'\\n]+)')".r

  private def timestampAsOfEpochMs(m: scala.util.matching.Regex.Match): Long =
    Option(m.group(1)).map(_.toLong).getOrElse {
      val s = m.group(2).trim
      try {
        if (s.matches("\\d{4}-\\d{2}-\\d{2}"))
          java.time.LocalDate.parse(s)
            .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
        else {
          val norm = s.replace(' ', 'T')
          (try java.time.Instant.parse(norm) // carries Z / an offset
          catch { case _: java.time.format.DateTimeParseException =>
            java.time.LocalDateTime.parse(norm)
              .atZone(java.time.ZoneOffset.UTC).toInstant
          }).toEpochMilli
        }
      } catch {
        case _: java.time.format.DateTimeParseException =>
          throw new IllegalArgumentException(
            s"TIMESTAMP AS OF '$s' is not a supported pin — use an " +
              "epoch-ms integer, 'yyyy-MM-dd', 'yyyy-MM-dd HH:mm:ss[.fff]' " +
              "or an ISO-8601 instant (zoneless forms are read as UTC)")
      }
    }

  /** Words that legitimately precede '(' without naming a function — used
    * to tell function-call parens (whose interior FROM is SQL-standard
    * trim/extract/substring syntax, never a relation reference) from
    * subquery/grouping parens. */
  private val NonFunctionWords = Set(
    "from", "join", "where", "on", "and", "or", "not", "in", "exists",
    "between", "select", "union", "all", "intersect", "except", "as",
    "when", "then", "else", "case", "end", "by", "group", "order",
    "having", "limit", "distinct", "values", "over", "using", "lateral",
    "cross", "inner", "left", "right", "full", "outer", "semi", "anti",
    "with", "like", "rlike", "ilike", "escape", "is", "div", "any", "some")

  /** Only literals that plausibly NAME A TABLE PATH are rewritten — a
    * bare word like the trim source in `trim(BOTH 'x' FROM 'xxabcx')`
    * must stay a string literal. */
  private def looksLikePath(s: String): Boolean =
    s.contains('/') || s.matches("[A-Za-z][A-Za-z0-9+.\\-]*:.*")

  /** SQL-standard doubled-quote unescape for a raw literal interior. */
  private def unescape(raw: String): String = raw.replace("''", "'")

  /** The rewrite gate: path-shaped literals ([[looksLikePath]]) always
    * rewrite; a RELATIVE SINGLE-SEGMENT literal (`FROM 'mytable'`, no
    * slash, no scheme) rewrites only when it actually IS a committed
    * table — a dir with a MANIFEST, resolved against the working dir like
    * every other relative path here. That check (one existence stat,
    * only for bare words after FROM/JOIN outside function args) is what
    * keeps `trim(BOTH 'x' FROM 'xxabcx')`-shaped literals intact without
    * silently dropping genuinely relative table references.
    */
  private def isTablePathLiteral(s: String): Boolean =
    looksLikePath(s) ||
      (s.nonEmpty && !s.contains('\n') &&
        // a literal that is not even a legal Path ('', '..' tricks with
        // NULs, …) is certainly not a table reference
        (try graft.streaming.TableFs.exists(s"$s/MANIFEST")
         catch { case _: IllegalArgumentException => false }))
  private val ChangesRel =
    "(?is)changes\\s*\\(\\s*'([^'\\n]+)'\\s*,\\s*(\\d+)\\s*,\\s*(\\d+)\\s*(?:,\\s*'([^']*)'\\s*)?\\)".r
  private val CatalogRel =
    "(?is)catalog\\s*\\(\\s*'([^'\\n]+)'\\s*,\\s*'([^'\\n]+)'\\s*(?:,\\s*(\\d+)\\s*)?\\)".r

  /** Read-side statement surface: `SELECT … FROM '<path>' [VERSION AS OF
    * <n> | TIMESTAMP AS OF <epoch-ms>] …` — quoted-path relation
    * references (after FROM or JOIN, at any nesting depth, outside string
    * literals) rewrite to session temp views over the manifest-table read
    * and the rewritten text goes to Spark's parser. The view is
    * `createOrReplaceTempView`'d on EVERY parse, so an un-pinned
    * reference always reflects the table's current version, and the read
    * carries full [[Upsert.readTable]] semantics — MoR sidecars, schema
    * evolution, time travel — not a bare file scan. Returns None when the
    * statement is not a query or references no quoted path. Ordinary SQL
    * DOES have `FROM '<literal>'` productions — `trim(BOTH 'x' FROM
    * 'xxabcx')`, `extract(YEAR FROM …)`, `substring(s FROM 2)` — so two
    * guards keep those intact: a FROM inside a function-call paren frame
    * is never a relation reference, and only literals that look like
    * paths ([[looksLikePath]]: contain '/' or a URI scheme) rewrite.
    */
  private[sql] def rewritePathReads(sqlText: String): Option[String] = {
    if (!QueryHead.matches(sqlText)) return None
    val out = new StringBuilder
    var i = 0
    var rewrote = false
    var quote: Char = 0
    // paren-kind stack: true = function-call paren (preceding token was a
    // function-name word), false = subquery/grouping paren. Inside a
    // function-call frame a FROM is SQL-standard argument syntax —
    // trim(BOTH 'x' FROM 'xxabcx'), extract(YEAR FROM ts), substring(s
    // FROM 2) — and must never be treated as a relation reference.
    var parenKinds = List.empty[Boolean]
    var prevWord = "" // last word token emitted, lowercased
    var prevSig: Char = 0 // last significant (non-ws, non-comment) char
    def isWordChar(c: Char) = c.isLetterOrDigit || c == '_'
    def inFunctionArgs = parenKinds.headOption.getOrElse(false)
    while (i < sqlText.length) {
      val c = sqlText.charAt(i)
      if (quote != 0) {
        out.append(c); if (c == quote) { quote = 0; prevSig = c }; i += 1
      }
      else if (c == '\'' || c == '"' || c == '`') {
        // string literals AND backtick identifiers are opaque
        out.append(c); quote = c; i += 1
      } else if (c == '-' && i + 1 < sqlText.length &&
          sqlText.charAt(i + 1) == '-') {
        // line comment: copy to end of line, rewrite nothing inside
        val eol = sqlText.indexOf('\n', i)
        val end = if (eol < 0) sqlText.length else eol + 1
        out.append(sqlText.substring(i, end)); i = end
      } else if (c == '/' && i + 1 < sqlText.length &&
          sqlText.charAt(i + 1) == '*') {
        // block comment: copy to the closing */ (or end of text)
        val close = sqlText.indexOf("*/", i + 2)
        val end = if (close < 0) sqlText.length else close + 2
        out.append(sqlText.substring(i, end)); i = end
      }
      else if (isWordChar(c) && (i == 0 || !isWordChar(sqlText.charAt(i - 1)))) {
        var j = i
        while (j < sqlText.length && isWordChar(sqlText.charAt(j))) j += 1
        val w = sqlText.substring(i, j).toLowerCase(java.util.Locale.ROOT)
        var k = j
        while (k < sqlText.length && sqlText.charAt(k).isWhitespace) k += 1
        // RAW literal interior — doubled-quote escapes ('') kept intact so
        // downstream index arithmetic (close = k + 1 + raw.length) stays
        // exact; unescape only when the value is USED as a path
        lazy val quotedLiteral: Option[String] =
          if (k < sqlText.length && sqlText.charAt(k) == '\'') {
            var e = k + 1
            var close = -1
            while (close < 0 && e < sqlText.length) {
              if (sqlText.charAt(e) == '\'') {
                if (e + 1 < sqlText.length && sqlText.charAt(e + 1) == '\'') e += 2
                else close = e
              } else e += 1
            }
            if (close > k) Some(sqlText.substring(k + 1, close)) else None
          } else None
        if (!inFunctionArgs && (w == "from" || w == "join") &&
            ChangesRel.findPrefixMatchOf(sqlText.substring(k)).isDefined) {
          // CHANGES('<path>', v1, v2 [, 'k1,k2']): the change feed as a
          // SQL relation — keys resolve from the table's CDF declaration
          // when the 4th argument is omitted
          val m = ChangesRel.findPrefixMatchOf(sqlText.substring(k)).get
          val view = registerChangesView(m.group(1), m.group(2).toLong,
            m.group(3).toLong, Option(m.group(4)))
          out.append(sqlText.substring(i, j)).append(' ').append(view)
          rewrote = true
          prevWord = view; prevSig = view.last
          i = k + m.end
        } else if (!inFunctionArgs && (w == "from" || w == "join") &&
            CatalogRel.findPrefixMatchOf(sqlText.substring(k)).isDefined) {
          // CATALOG('<catalogPath>', '<name>' [, <catalogVersion>]): the
          // multi-table-transaction catalog as a SQL front door — the
          // name resolves to its PINNED (table path, version); the third
          // argument reads the pins AS OF an earlier catalog version
          // (cross-table time travel)
          val m = CatalogRel.findPrefixMatchOf(sqlText.substring(k)).get
          val view = registerCatalogView(m.group(1), m.group(2),
            Option(m.group(3)).map(_.toLong))
          out.append(sqlText.substring(i, j)).append(' ').append(view)
          rewrote = true
          prevWord = view; prevSig = view.last
          i = k + m.end
        } else if (!inFunctionArgs && (w == "from" || w == "join") &&
            quotedLiteral.exists(raw => isTablePathLiteral(unescape(raw)))) {
          val path = quotedLiteral.get // raw: length positions the close quote
          val close = k + 1 + path.length
          val rest = sqlText.substring(close + 1)
          val (suffix, tailStart) = VersionClause.findPrefixMatchOf(rest) match {
            case Some(m) => (s"@v${m.group(1)}", close + 1 + m.end)
            case None => TimestampClause.findPrefixMatchOf(rest) match {
              case Some(m) => (s"@t${timestampAsOfEpochMs(m)}", close + 1 + m.end)
              case None => ("", close + 1)
            }
          }
          val view = registerPathView(unescape(path), suffix)
          out.append(sqlText.substring(i, j)).append(' ').append(view)
          rewrote = true
          prevWord = view; prevSig = view.last
          i = tailStart
        } else {
          out.append(sqlText.substring(i, j))
          prevWord = w; prevSig = sqlText.charAt(j - 1)
          i = j
        }
      } else {
        if (c == '(')
          parenKinds ::= (isWordChar(prevSig) &&
            !NonFunctionWords.contains(prevWord))
        else if (c == ')' && parenKinds.nonEmpty)
          parenKinds = parenKinds.tail
        out.append(c)
        if (!c.isWhitespace) prevSig = c
        i += 1
      }
    }
    if (rewrote) Some(out.toString) else None
  }

  /** Register (or refresh) the temp view for the `CHANGES('<path>', v1,
    * v2 [, 'keys'])` relation: [[Upsert.tableChanges]] between the two
    * versions, keys from the explicit 4th argument or the table's CDF
    * declaration — absent both, the error says which to provide.
    */
  private def registerChangesView(path: String, from: Long, to: Long,
                                  keysArg: Option[String]): String = {
    val spark = SparkSession.active
    val c = committerFor(path)
    val keys = keysArg.map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty)
      .orElse(Upsert.changeFeedKeys(path, c))
      .getOrElse(throw new IllegalArgumentException(
        s"CHANGES('$path', $from, $to) needs key columns — enable the " +
          "change feed on the table (Upsert.enableChangeFeed) or pass " +
          "them explicitly: CHANGES('<path>', v1, v2, 'k1,k2')"))
    val df = Upsert.tableChanges(spark, path, from, to, keys, c)
    val name = "graft_changes_" + java.security.MessageDigest
      .getInstance("MD5")
      .digest(s"$path@$from-$to:${keys.mkString(",")}".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    df.createOrReplaceTempView(name)
    name
  }

  /** Register (or refresh) the temp view for `path` at the pinned
    * `suffix` ("" current, "@v<n>" version, "@t<ms>" timestamp) and
    * return its deterministic name. The md5 of path+pin keys the name, so
    * the same reference in one statement — or across statements — shares
    * one view; re-registration is how an un-pinned view tracks commits.
    */
  /** The catalog-name read behind the `CATALOG(…)` relation: resolve the
    * name to its pinned (table path, version) — current pins, or the pins
    * as of `catalogVersion` — and read the table AS OF that pin with full
    * manifest-table semantics. The view re-registers on every parse, so
    * an unpinned reference always reflects the latest catalog flip.
    */
  private def registerCatalogView(catalogPath: String, name: String,
                                  catalogVersion: Option[Long]): String = {
    val spark = SparkSession.active
    val cc = committerFor(catalogPath)
    val entries = (catalogVersion match {
      case Some(v) => cc.readManifestAsOf(catalogPath, v)
      case None    => cc.readManifest(catalogPath)
    }).filterNot(_._1.startsWith("__"))
    val pinned = entries.getOrElse(name,
      throw new IllegalArgumentException(
        s"no table '$name' in catalog $catalogPath" +
          catalogVersion.fold("")(v => s" at version $v") +
          s" (tables: ${entries.keys.toSeq.sorted.mkString(",")})"))
    val Array(p, ver) = pinned.split("\t", 2)
    val df = Upsert.readTableAsOf(spark, p, ver.toLong, committerFor(p))
    val viewName = "graft_cat_" + java.security.MessageDigest.getInstance("MD5")
      .digest(s"$catalogPath/$name@${catalogVersion.getOrElse(-1L)}"
        .getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    df.createOrReplaceTempView(viewName)
    viewName
  }

  private def registerPathView(path: String, suffix: String): String = {
    val spark = SparkSession.active
    val c = committerFor(path)
    val df = suffix match {
      case "" => Upsert.readTable(spark, path, c)
      case v if v.startsWith("@v") =>
        Upsert.readTableAsOf(spark, path, v.drop(2).toLong, c)
      case t => Upsert.readTableAsOfTimestamp(spark, path, t.drop(2).toLong, c)
    }
    val name = "graft_path_" + java.security.MessageDigest.getInstance("MD5")
      .digest((path + suffix).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    df.createOrReplaceTempView(name)
    name
  }
}

/** Delegating parser: lifecycle statements short-circuit to their
  * commands, everything else is Spark's SQL verbatim.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    LifecycleSql.parse(sqlText).getOrElse(
      LifecycleSql.rewritePathReads(sqlText) match {
        case Some(rewritten) => delegate.parsePlan(rewritten)
        case None            => delegate.parsePlan(sqlText)
      })
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
