package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, Cast, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
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
  * Conservative by construction: only single-column comparisons against
  * foldable numeric literals prune (Cast-wrapped attributes unwrapped,
  * conjunctions split); anything else — and any partition without
  * recorded stats — keeps the partition. Pruning never changes results,
  * only which dirs get listed.
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
    spark.baseRelationToDataFrame(HadoopFsRelation(
      location = index,
      partitionSchema = new StructType(),
      dataSchema = schema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map.empty)(spark))
  }

  /** Allowed interval [lo, hi] a single comparison conjunct imposes on a
    * named column, if it is of the prunable shape. Equality pins a point;
    * strict bounds are treated inclusively (safe: pruning may only ever
    * KEEP more).
    */
  private[sources] def boundOf(e: Expression): Option[(String, Double, Double)] = {
    def attrName(x: Expression): Option[String] = x match {
      case a: Attribute => Some(a.name)
      case Cast(a: Attribute, _, _, _) => Some(a.name)
      case _ => None
    }
    def litVal(x: Expression): Option[Double] = x match {
      case l: Literal if l.value != null &&
          l.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] =>
        Some(l.value.toString.toDouble)
      case Cast(l: Literal, t, _, _) if l.value != null => litValCast(l, t)
      case _ => None
    }
    e match {
      case GreaterThanOrEqual(a, v) => for (n <- attrName(a); x <- litVal(v)) yield (n, x, Double.MaxValue)
      case GreaterThan(a, v)        => for (n <- attrName(a); x <- litVal(v)) yield (n, x, Double.MaxValue)
      case LessThanOrEqual(a, v)    => for (n <- attrName(a); x <- litVal(v)) yield (n, Double.MinValue, x)
      case LessThan(a, v)           => for (n <- attrName(a); x <- litVal(v)) yield (n, Double.MinValue, x)
      case EqualTo(a, v)            => for (n <- attrName(a); x <- litVal(v)) yield (n, x, x)
      // flipped literal-first forms
      case GreaterThanOrEqual(v, a) if attrName(a).isDefined => for (n <- attrName(a); x <- litVal(v)) yield (n, Double.MinValue, x)
      case GreaterThan(v, a) if attrName(a).isDefined        => for (n <- attrName(a); x <- litVal(v)) yield (n, Double.MinValue, x)
      case LessThanOrEqual(v, a) if attrName(a).isDefined    => for (n <- attrName(a); x <- litVal(v)) yield (n, x, Double.MaxValue)
      case LessThan(v, a) if attrName(a).isDefined           => for (n <- attrName(a); x <- litVal(v)) yield (n, x, Double.MaxValue)
      case _ => None
    }
  }

  private def litValCast(l: Literal, t: DataType): Option[Double] =
    try Option(Cast(l, t).eval(null)).map(_.toString.toDouble)
    catch { case _: Throwable => None }

  private[sources] def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }
}

/** [[FileIndex]] over a committed manifest: `listFiles` resolves the data
  * entries, consults the committed zone maps against the pushed data
  * filters, and lists ONLY the surviving partitions' dirs — unpruned
  * partitions are never listed, the manifest-level skipping contract.
  */
final class ManifestFileIndex(spark: SparkSession, tablePath: String,
                              committer: SnapshotCommitter) extends FileIndex {

  private val manifest: Map[String, String] = committer.readManifest(tablePath)
  private val entries: Map[String, String] =
    manifest.filterNot(_._1.startsWith("__"))
  require(entries.nonEmpty, s"no committed table at $tablePath")

  private[sources] def committedSchema: Option[StructType] =
    manifest.get("__schema").map(j =>
      DataType.fromJson(j).asInstanceOf[StructType])

  private[sources] def dataPaths: Seq[String] =
    entries.values.map(rel => s"$tablePath/$rel").toSeq

  override def rootPaths: Seq[Path] = Seq(new Path(tablePath))

  override def partitionSchema: StructType = new StructType()

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val bounds = dataFilters.flatMap(ManifestTable.splitConjuncts)
      .flatMap(ManifestTable.boundOf)
    val kept = entries.filter { case (p, _) =>
      bounds.forall { case (colName, lo, hi) =>
        graft.pipeline.Upsert.rangeOf(manifest, p, colName)
          .forall { case (mn, mx) => mx >= lo && mn <= hi }
      }
    }
    val fs = new Path(tablePath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    kept.toSeq.sortBy(_._1).map { case (_, rel) =>
      val dir = new Path(s"$tablePath/$rel")
      val files = fs.listStatus(dir).filter { st =>
        st.isFile && !st.getPath.getName.startsWith(".") &&
          !st.getPath.getName.startsWith("_")
      }
      PartitionDirectory(InternalRow.empty, files)
    }
  }

  override def inputFiles: Array[String] = {
    val fs = new Path(tablePath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    dataPaths.flatMap { d =>
      fs.listStatus(new Path(d)).filter(_.isFile).map(_.getPath.toString)
    }.toArray
  }

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = {
    val fs = new Path(tablePath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    dataPaths.map { d =>
      fs.listStatus(new Path(d)).filter(_.isFile).map(_.getLen).sum
    }.sum
  }
}
