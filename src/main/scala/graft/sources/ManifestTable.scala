package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, Cast, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{DataType, StructType}

import graft.streaming.{AtomicRenameCommitter, SnapshotCommitter}

/** DECLARATIVE manifest-table reads — the committed manifest (and its zone
  * maps) surfaced to Catalyst as a custom [[FileIndex]], so pruning needs
  * no special read API: `readTable(...).filter(ts between lo and hi)`
  * plans a scan whose `listFiles` receives the PUSHED data filters and
  * answers with only the partitions whose committed [min,max] can
  * intersect them. This is the brief's "custom plumbing only where
  * built-ins can't express it" applied to the storage seam: the
  * DataFrame stays fully declarative (pushdown, pruning, codegen all
  * apply), and the skipping decision that `Upsert.readTableRangePruned`
  * exposes imperatively happens inside scan planning instead — the same
  * division of labor Delta/Iceberg use (their DataSourceV2 scan builders
  * consult table metadata; this engine's tables speak DataSourceV1's
  * `FileIndex`, the seam the parquet relation already planned through).
  *
  * Conservative by construction: only BARE-column comparisons against
  * foldable numeric literals prune (conjunctions split; cast-wrapped
  * attributes refused — see [[ManifestTable.boundOf]]); anything else —
  * and any partition without recorded stats — keeps the partition.
  * Pruning never changes results, only which dirs get listed.
  */
object ManifestTable {

  /** The committed table as a Catalyst-planned relation over a
    * [[ManifestFileIndex]] — schema bound from the manifest (falls back
    * to footer inference only for pre-schema-metadata tables).
    */
  def readTableIndexed(spark: SparkSession, tablePath: String,
                       committer: SnapshotCommitter = AtomicRenameCommitter): DataFrame = {
    val index = new ManifestFileIndex(spark, tablePath, committer)
    val schema = index.committedSchema.getOrElse(
      spark.read.parquet(index.dataPaths: _*).schema)
    val physical = spark.baseRelationToDataFrame(HadoopFsRelation(
      location = index,
      partitionSchema = new StructType(),
      dataSchema = schema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map.empty)(spark))
    // logical names (and the MoR sidecar composition) compose ABOVE the
    // relation: Catalyst pushes filters through the rename Project — and
    // through the anti-join's left side / into both union branches — so
    // the FileIndex keeps consulting its physical-named zone maps and
    // bloom sidecars for the BASE files while pending delta rows answer
    // the same filters directly
    graft.pipeline.Upsert.toLogical(
      graft.pipeline.Upsert.applyMor(spark, physical, index.manifest,
        tablePath), index.manifest)
  }

  /** Allowed interval [lo, hi] a single comparison conjunct imposes on a
    * named column, if it is of the prunable shape — a BARE attribute
    * compared to a foldable numeric literal, in either operand order.
    * Cast-wrapped attributes deliberately do NOT prune: a truncating or
    * narrowing cast (`col("x").cast("long") <= 5`) changes the value the
    * predicate sees, so comparing the RAW column's zone map against the
    * literal could skip a partition that holds matching rows — the one
    * failure direction zone maps must never have. (Literal-side casts are
    * fine: the literal is evaluated through its cast.) Equality pins a
    * point; strict bounds are treated inclusively (safe: pruning may only
    * ever KEEP more).
    */
  private[graft] def boundOf(e: Expression): Option[(String, Double, Double)] = {
    def attrName(x: Expression): Option[String] = x match {
      case a: Attribute => Some(a.name)
      case _ => None
    }
    def litVal(x: Expression): Option[Double] = x match {
      case l: Literal if l.value != null &&
          l.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] =>
        Some(l.value.toString.toDouble)
      case Cast(l: Literal, t, _, _) if l.value != null => litValCast(l, t)
      case _ => None
    }
    // (attr-bound for attr-first form, attr-bound for literal-first form)
    def sided(a: Expression, v: Expression,
              attrFirst: Double => (Double, Double),
              litFirst: Double => (Double, Double)): Option[(String, Double, Double)] =
      (attrName(a), litVal(v)) match {
        case (Some(n), Some(x)) => val (lo, hi) = attrFirst(x); Some((n, lo, hi))
        case _ => (attrName(v), litVal(a)) match {
          case (Some(n), Some(x)) => val (lo, hi) = litFirst(x); Some((n, lo, hi))
          case _ => None
        }
      }
    e match {
      case GreaterThanOrEqual(a, v) =>
        sided(a, v, x => (x, Double.MaxValue), x => (Double.MinValue, x))
      case GreaterThan(a, v) =>
        sided(a, v, x => (x, Double.MaxValue), x => (Double.MinValue, x))
      case LessThanOrEqual(a, v) =>
        sided(a, v, x => (Double.MinValue, x), x => (x, Double.MaxValue))
      case LessThan(a, v) =>
        sided(a, v, x => (Double.MinValue, x), x => (x, Double.MaxValue))
      case EqualTo(a, v) => sided(a, v, x => (x, x), x => (x, x))
      case _ => None
    }
  }

  private def litValCast(l: Literal, t: DataType): Option[Double] =
    try Option(Cast(l, t).eval(null)).map(_.toString.toDouble)
    catch { case _: Throwable => None }

  private[graft] def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }

  /** The point-lookup values a single conjunct pins a named column to, if
    * it has the bloom-prunable shape: a BARE attribute `=` a literal (in
    * either operand order) or `IN` an all-literal list. Same conservatism
    * as [[boundOf]]: cast-wrapped attributes refuse to prune (the bloom
    * recorded the RAW column's values), and null literals are dropped
    * from the list (`=`/`IN` never match null — a partition is skipped
    * only when every remaining value is provably absent). An emptied list
    * returns None: "matches nothing" is the exact filter's call, not the
    * pruner's.
    */
  private[graft] def pointsOf(e: Expression): Option[(String, Seq[Any])] = {
    def bare(x: Expression): Option[String] = x match {
      case a: Attribute => Some(a.name)
      case _ => None
    }
    val raw: Option[(String, Seq[Any])] = e match {
      case EqualTo(a: Attribute, l: Literal) => Some((a.name, Seq(l.value)))
      case EqualTo(l: Literal, a: Attribute) => Some((a.name, Seq(l.value)))
      case In(a, list) if bare(a).isDefined && list.nonEmpty &&
          list.forall(_.isInstanceOf[Literal]) =>
        Some((bare(a).get, list.map(_.asInstanceOf[Literal].value)))
      case _ => None
    }
    raw.map { case (n, vs) => (n, vs.filter(_ != null)) }
      .filter(_._2.nonEmpty)
  }
}

/** [[FileIndex]] over a committed manifest: `listFiles` resolves the data
  * entries, consults the committed zone maps against the pushed data
  * filters, and lists ONLY the surviving partitions' dirs — unpruned
  * partitions are never listed, the manifest-level skipping contract.
  */
final class ManifestFileIndex(spark: SparkSession, tablePath: String,
                              committer: SnapshotCommitter) extends FileIndex {

  private[graft] val manifest: Map[String, String] = committer.readManifest(tablePath)
  private val entries: Map[String, String] =
    manifest.filterNot(_._1.startsWith("__"))
  require(entries.nonEmpty, s"no committed table at $tablePath")

  // one schema-metadata contract: the write path's helper, not a re-parse
  private[sources] def committedSchema: Option[StructType] =
    graft.pipeline.Upsert.committedSchemaOf(manifest)

  /** Committed ANALYZE stats for the planner seam ((rowcount, col→NDV);
    * see [[graft.plans.StatsJoinReorder]]) — None gates cost-based
    * rewrites off for never-ANALYZEd tables.
    */
  private[graft] lazy val cboStats: Option[(Long, Map[String, Long])] =
    graft.pipeline.Upsert.cboStatsOf(manifest)

  /** [[cboStats]] extended with null counts and min/max — the inputs
    * [[graft.plans.StatsJoinReorder]]'s filter-selectivity estimates
    * read.
    */
  private[graft] lazy val cboColStats: Option[(Long, Map[String, graft.pipeline.Upsert.CboColStats])] =
    graft.pipeline.Upsert.cboColStatsOf(manifest)

  private[sources] def dataPaths: Seq[String] =
    entries.values.map(rel => s"$tablePath/$rel").toSeq

  private def isDataFile(name: String): Boolean =
    !name.startsWith(".") && !name.startsWith("_")

  // the manifest snapshot is immutable for this index's lifetime, so the
  // full listing (planning statistics + inputFiles) happens ONCE — the
  // per-query path is listFiles, which lists only surviving partitions
  private lazy val allFiles: Array[org.apache.hadoop.fs.FileStatus] = {
    val fs = new Path(tablePath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    dataPaths.flatMap { d =>
      fs.listStatus(new Path(d)).filter(st =>
        st.isFile && isDataFile(st.getPath.getName))
    }.toArray
  }

  override def rootPaths: Seq[Path] = Seq(new Path(tablePath))

  override def partitionSchema: StructType = new StructType()

  // committed bloom sidecars, loaded lazily per (dir, col) and memoized
  // for the index's (immutable-snapshot) lifetime — repeated listFiles
  // calls never re-read a sidecar
  private val bloomCols = graft.pipeline.Upsert.bloomStatsCols(manifest).toSet
  private val bloomCache = scala.collection.concurrent.TrieMap
    .empty[(String, String), Option[org.apache.spark.util.sketch.BloomFilter]]
  private def bloomFor(rel: String, colName: String) =
    bloomCache.getOrElseUpdate((rel, colName),
      graft.pipeline.Upsert.bloomOf(tablePath, rel, colName))

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val conjuncts = dataFilters.flatMap(ManifestTable.splitConjuncts)
    val bounds = conjuncts.flatMap(ManifestTable.boundOf)
    val points = conjuncts.flatMap(ManifestTable.pointsOf)
      .filter { case (c, _) => bloomCols.contains(c) }
    // generated-partition declaration: bounds on the SOURCE column become
    // exact intervals on the partition value (monotone transform image)
    val genPart = graft.pipeline.Upsert.genPartOf(manifest)
    val genBounds = genPart.map { case (_, srcPhys, t) =>
      (t, bounds.filter(_._1 == srcPhys))
    }.filter(_._2.nonEmpty)
    val kept = entries.filter { case (p, rel) =>
      bounds.forall { case (colName, lo, hi) =>
        graft.pipeline.Upsert.rangeOf(manifest, p, colName)
          .forall { case (mn, mx) => mx >= lo && mn <= hi }
      } && genBounds.forall { case (t, bs) =>
        bs.forall { case (_, lo, hi) =>
          graft.pipeline.Upsert.genPartKeeps(p, t, lo, hi)
        }
      } && points.forall { case (colName, vs) =>
        bloomFor(rel, colName).forall(bf =>
          vs.exists(graft.pipeline.Upsert.bloomMightContain(bf, _)))
      }
    }
    val fs = new Path(tablePath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    kept.toSeq.sortBy(_._1).map { case (p, rel) =>
      val dir = new Path(s"$tablePath/$rel")
      // per-FILE stats: one checkpointed sidecar read per partition (not
      // a manifest entry per file) — inside a surviving partition, a file
      // whose committed [min,max] cannot intersect the pushed bounds is
      // never listed into the scan (absent/stale entry = keep)
      val fstats =
        if (bounds.isEmpty) Map.empty[String, String]
        else graft.pipeline.Upsert.fileStatsOf(tablePath, manifest, p)
      val files = fs.listStatus(dir).filter { st =>
        st.isFile && isDataFile(st.getPath.getName) &&
          bounds.forall { case (colName, lo, hi) =>
            fstats.get(st.getPath.getName)
              .flatMap(graft.pipeline.Upsert.parseRangeJson(_, colName))
              .forall { case (mn, mx) => mx >= lo && mn <= hi }
          }
      }
      PartitionDirectory(InternalRow.empty, files)
    }
  }

  /** Exact base row count from committed `__rows` metadata, when provable
    * (every data partition stamped, no pending MoR sidecars) — what lets
    * [[graft.plans.MetadataOnlyCount]] answer COUNT(*) without a scan.
    */
  private[graft] def metadataRowCount: Option[Long] =
    graft.pipeline.Upsert.metadataRowCount(manifest)

  override def inputFiles: Array[String] = allFiles.map(_.getPath.toString)

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = allFiles.map(_.getLen).sum
}
