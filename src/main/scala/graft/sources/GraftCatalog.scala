package graft.sources

import java.util

import scala.collection.JavaConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** DataSourceV2 catalog over graft tables — the STORAGE-PARTITIONED JOIN
  * (SPJ) read path.
  *
  * The V1 `format("graft")` reader (and the session-catalog DDL surface)
  * cover every batch/stream shape, but a V1 relation cannot tell the
  * planner HOW its files are laid out: a join of two tables hidden-
  * bucketed on the same key (`gfb<n>_<col>=<b>` dirs, Iceberg's
  * `bucket(n, col)` transform — [[GraftLog.overwriteBucketTransform]])
  * still plans two full hash exchanges, the single largest avoidable
  * cost of a 100 TB fact-fact join. Spark's own answer is the DSv2
  * storage-partitioned join (SPIP in SPARK-37375): a scan that reports
  * [[KeyGroupedPartitioning]] over input partitions carrying their
  * partition key lets `EnsureRequirements` prove both sides are
  * already co-partitioned and plan the join with ZERO exchanges.
  * This catalog is that contract for graft tables:
  *
  *   - `spark.sql.catalog.<name> = graft.sources.GraftCatalog`, then
  *     `spark.table("<name>.`/abs/table/path`")` — the identifier IS
  *     the table path (the `delta.`p`` idiom);
  *   - [[GraftSpjTable]] pins the log snapshot at load: live files +
  *     commit-logged sizes come from ONE metadata replay, zero data
  *     files opened, and the per-file bucket value is parsed from the
  *     `gfb…=` dir segment the writer landed it under;
  *   - the scan groups files into one [[InputPartition]] PER BUCKET
  *     (implementing [[HasPartitionKey]]) and reports
  *     `KeyGroupedPartitioning(bucket(n, col), #buckets-present)`;
  *     Spark resolves the `bucket` transform through THIS catalog's
  *     [[FunctionCatalog]] face — [[GraftBucketFunction]] evaluates
  *     the IDENTICAL `pmod(xxhash64(col, 42), n)` the writer and the
  *     planner-side pruning ([[GraftLog.bucketFor]]) use, so a
  *     co-partitioning proof can never drift from the layout;
  *   - rows are read by the SAME codegen'd vectorized parquet reader
  *     the V1 path uses ([[ParquetFileFormat.buildReaderWithPartitionValues]]),
  *     with required-column pruning and parquet row-group filter
  *     pushdown wired through the DSv2 `SupportsPushDown*` mixins, and
  *     equality probes on the bucket source column dropping whole
  *     bucket partitions at plan time.
  *
  * Scale contract: at 1000 executors the join's only data movement is
  * the partition-local sort feeding the merge join — no shuffle of
  * either fact table, ever. A `groupBy(col)` over the bucket column is
  * likewise exchange-free ([[KeyGroupedPartitioning]] satisfies the
  * aggregation's ClusteredDistribution: equal keys hash to equal
  * buckets). Layout soundness rule (same as t41/d25): flat and
  * hidden-bucket layouts only — data files carry the full schema.
  * Visible hive layouts (values live in dir names, not files), active
  * deletion vectors, and column mapping refuse loudly and point at
  * `format("graft")`, which handles all three.
  *
  * Reference: the lake the reference orchestrates keeps its fact
  * tables joinable on customer/asset keys
  * (`mage_demo/custom/delta_table_write.py`,
  * `financial_dl_gold.py`) — at its Delta runtime's scale ceiling those
  * joins shuffle; this is the Spark-native layout-aware replacement. */
final class GraftCatalog extends TableCatalog with FunctionCatalog {

  private var catName: String = "graft_spj"

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = { catName = name }

  override def name(): String = catName

  // ---- TableCatalog ----

  override def loadTable(ident: Identifier): Table =
    load(ident, None)

  /** `SELECT … FROM graft_spj.`p` VERSION AS OF v` — V2 time travel. */
  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, Some(version.toLong))

  /** `TIMESTAMP AS OF …`; Spark hands MICROseconds since epoch.
    * Resolution = [[GraftLog.versionAt]] (latest commit at-or-before,
    * the Delta contract every other AS OF surface here uses). */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val spark = SparkSession.active
    val path = pathOf(ident)
    load(ident, Some(GraftLog.versionAt(spark, path, timestamp / 1000L)))
  }

  private def pathOf(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(".")

  private def load(ident: Identifier, asOf: Option[Long]): Table = {
    val path = pathOf(ident)
    val spark = SparkSession.active
    if (!GraftLog.isGraftTable(spark, path))
      throw new NoSuchTableException(ident)
    new GraftSpjTable(spark, path, asOf)
  }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty // path-addressed: there is no namespace to enumerate

  override def createTable(ident: Identifier, columns: Array[Column],
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "graft SPJ catalog is read-only: create tables with GraftLog " +
        "writers or CREATE TABLE ... USING graft")

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft SPJ catalog is read-only: use ALTER TABLE on the session " +
        "catalog entry or the GraftLog API")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "graft SPJ catalog is read-only: drop via the session catalog")

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft SPJ catalog is read-only: rename via the session catalog")

  // ---- FunctionCatalog: resolves the `bucket` transform the scans
  //      report. Spark looks the name up HERE (the relation's own
  //      catalog) when converting KeyGroupedPartitioning keys to
  //      catalyst TransformExpressions — both join sides resolve to the
  //      same BoundFunction canonicalName, which is the compatibility
  //      proof EnsureRequirements needs. ----

  override def listFunctions(
      namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(Array.empty, "bucket"))

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.name().equalsIgnoreCase("bucket") && ident.namespace().isEmpty)
      GraftBucketFunction
    else throw new NoSuchFunctionException(ident)
}

/** Iceberg-style `bucket(n, col)` as a V2 catalog function. The bound
  * form evaluates the exact layout hash — `pmod(xxhash64(value, 42), n)`
  * via the same Catalyst [[org.apache.spark.sql.catalyst.expressions.XxHash64]]
  * the writer's `pmod(xxhash64(col), n)` column evaluates — so anything
  * Spark derives from the function (SPJ compatibility, one-side
  * re-shuffle under `v2.bucketing.shuffle.enabled`) agrees with the
  * files on disk bit-for-bit. */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col): graft hidden-bucket transform — pmod(xxhash64(col, 42), n)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket expects (numBuckets, value), got ${inputType.catalogString}")
    require(Set[DataType](ByteType, ShortType, IntegerType, LongType)
        .contains(inputType.fields(0).dataType),
      s"bucket numBuckets must be integral, got ${inputType.fields(0).dataType}")
    new GraftBucketBound(inputType.fields(1).dataType)
  }
}

/** Bound `bucket` — see [[GraftBucketFunction]]. `canonicalName`
  * includes the key type: two scans' transforms are SPJ-compatible iff
  * they hash the same value domain the same way. */
final class GraftBucketBound(keyType: DataType)
    extends ScalarFunction[Integer] {
  override def name(): String = "bucket"
  override def canonicalName(): String =
    s"graft.bucket(${keyType.catalogString})"
  override def inputTypes(): Array[DataType] =
    Array(IntegerType, keyType)
  override def resultType(): DataType = IntegerType
  override def isResultNullable: Boolean = false

  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    val v = input.get(1, keyType)
    Integer.valueOf(GraftLog.bucketForInternal(v, keyType, n))
  }
}

/** One graft table pinned at its load-time snapshot (the Delta idiom:
  * analysis sees one consistent version). Metadata-only: files, sizes,
  * schema, and the bucket spec all come from the log replay. */
final class GraftSpjTable(spark: SparkSession, path: String,
    asOf: Option[Long] = None)
    extends Table with SupportsRead {

  // Resolve the snapshot version ONCE: the soundness gate and the file
  // list must see the same snapshot — with asOf=None, two independent
  // latest-version replays would let a concurrent commit that adds a
  // deletion vector (or a hive layout) land between the gate and the
  // listing and slip past the verbatim-read check.
  private val pinned: Option[Long] =
    asOf.orElse(GraftLog.latestVersion(spark, path))

  GraftLog.requireSpjReadable(spark, path, pinned)

  private[sources] val (filesSized, tableSchema) =
    GraftLog.liveFilesSized(spark, path, pinned)

  /** (srcCol, nBuckets) when EVERY live file sits under the same
    * single hidden-bucket spec; None on flat tables or mixed specs
    * (readable either way — only the partitioning report differs). */
  private[sources] val bucketSpec: Option[(String, Int)] = {
    val specs = filesSized.map { case (rel, _) =>
      rel.split('/').dropRight(1).toSeq
        .filter(_.contains('=')) // col=val dirs only, never _data/<uuid>
        .map(_.takeWhile(_ != '='))
    }.distinct
    specs match {
      case Seq(Seq(GraftLog.HiddenBucketDir(n, src))) =>
        Some((src, n.toInt))
      case _ => None
    }
  }

  override def name(): String = s"graft.`$path`"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def partitioning(): Array[Transform] =
    bucketSpec.map { case (src, n) =>
      Expressions.bucket(n, src)
    }.toArray

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftSpjScanBuilder(spark, path, this)
}

/** Scan builder: column pruning + filter pushdown. Filters are never
  * CLAIMED (all return as residual — Spark re-evaluates, so pushdown is
  * pure cost), but they are USED twice: parquet row-group skipping in
  * the reader, and whole-bucket pruning when an equality/IN probe hits
  * the bucket source column (the same planner-side contract
  * [[GraftFileIndex]]'s mayMatchBucket gives the V1 path). */
final class GraftSpjScanBuilder(spark: SparkSession, path: String,
    table: GraftSpjTable)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var required: StructType = table.tableSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // keep the table's field order (parquet readers want a subset in
    // file order); empty projections (count(*)) keep the NARROWEST
    // column by defaultSize — taking the first field would read a
    // text column on wide-string tables, defeating the pruning
    required =
      if (requiredSchema.isEmpty)
        StructType(Seq(table.tableSchema.fields
          .minBy(_.dataType.defaultSize)))
      else StructType(table.tableSchema.fields.filter(f =>
        requiredSchema.fieldNames.exists(_.equalsIgnoreCase(f.name))))

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(_.references.forall(r =>
      table.tableSchema.fieldNames.exists(_.equalsIgnoreCase(r))))
    filters // all residual: Spark re-evaluates, pushdown is cost-only
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new GraftSpjScan(spark, path, table, required, pushed)
}

/** The scan: one [[InputPartition]] per present bucket (files grouped
  * by their `gfb…=` dir), each carrying its bucket id as the partition
  * key; `outputPartitioning` reports the matching
  * [[KeyGroupedPartitioning]]. Flat/mixed tables fall back to one
  * partition per file under [[UnknownPartitioning]] — still a correct,
  * pruned, vectorized read. */
final class GraftSpjScan(spark: SparkSession, path: String,
    table: GraftSpjTable, required: StructType, filters: Array[Filter])
    extends Scan with Batch
    with SupportsReportPartitioning with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftSpjScan $path buckets=${table.bucketSpec}"

  /** Bucket ids an equality/IN probe on the source column allows; None
    * = no usable probe (keep every bucket). */
  private def allowedBuckets: Option[Set[Int]] =
    table.bucketSpec.flatMap { case (src, n) =>
      val dt = table.tableSchema.fields
        .find(_.name.equalsIgnoreCase(src)).map(_.dataType)
      def buckets(f: Filter): Option[Set[Int]] = f match {
        case org.apache.spark.sql.sources.EqualTo(a, v)
            if a.equalsIgnoreCase(src) && dt.isDefined =>
          Some(Set(GraftLog.bucketFor(v, dt.get, n)))
        case org.apache.spark.sql.sources.In(a, vs)
            if a.equalsIgnoreCase(src) && dt.isDefined =>
          Some(vs.map(GraftLog.bucketFor(_, dt.get, n)).toSet)
        case org.apache.spark.sql.sources.And(l, r) =>
          (buckets(l), buckets(r)) match {
            case (Some(x), Some(y)) => Some(x intersect y)
            case (x, y)             => x.orElse(y)
          }
        case _ => None
      }
      filters.flatMap(buckets(_)).reduceOption(_ intersect _)
    }

  private lazy val partitions: Array[InputPartition] =
    table.bucketSpec match {
      case Some((_, _)) =>
        val byBucket = table.filesSized.groupBy { case (rel, _) =>
          val seg = rel.split('/').dropRight(1)
            .find(_.contains('=')).get // uniform spec: guaranteed above
          seg.substring(seg.indexOf('=') + 1).toInt
        }
        val kept = allowedBuckets match {
          case Some(allow) => byBucket.filter { case (b, _) =>
            allow.contains(b) }
          case None => byBucket
        }
        kept.toArray.sortBy(_._1).map { case (b, fs) =>
          GraftBucketInputPartition(b,
            fs.map { case (rel, sz) =>
              (GraftLog.absPath(path, rel), sz) }.toArray)
            : InputPartition
        }
      case None =>
        table.filesSized.map { case (rel, sz) =>
          GraftFilesInputPartition(
            Array((GraftLog.absPath(path, rel), sz))): InputPartition
        }.toArray
    }

  override def planInputPartitions(): Array[InputPartition] = partitions

  override def outputPartitioning(): Partitioning =
    table.bucketSpec match {
      // an impossible conjunction can prune to ZERO buckets — report
      // unknown rather than a 0-partition key grouping
      case Some((src, n)) if partitions.nonEmpty =>
        new KeyGroupedPartitioning(
          Array(Expressions.bucket(n, src)), partitions.length)
      case _ => new UnknownPartitioning(partitions.length)
    }

  override def estimateStatistics(): Statistics = new Statistics {
    private val bytes = partitions.map {
      case GraftBucketInputPartition(_, fs) => fs.map(_._2).sum
      case GraftFilesInputPartition(fs)     => fs.map(_._2).sum
      case _                                => 0L
    }.sum
    override def sizeInBytes(): util.OptionalLong =
      util.OptionalLong.of(math.max(bytes, 1L))
    override def numRows(): util.OptionalLong = util.OptionalLong.empty()
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // the V1 vectorized parquet reader, built once on the driver and
    // shipped as a serializable closure (the FileScanRDD contract)
    val readFunc = new ParquetFileFormat().buildReaderWithPartitionValues(
      sparkSession = spark,
      dataSchema = table.tableSchema,
      partitionSchema = new StructType(),
      requiredSchema = required,
      filters = filters.toSeq,
      // rows, not ColumnarBatches: the vectorized reader still runs
      // underneath, wrapped in its own batch→row iterator
      options = Map(org.apache.spark.sql.execution.datasources
        .FileFormat.OPTION_RETURNING_BATCH -> "false"),
      hadoopConf =
        spark.sessionState.newHadoopConfWithOptions(Map.empty))
    new GraftParquetReaderFactory(readFunc)
  }
}

/** Files of ONE bucket; `partitionKey` is the bucket id — the value the
  * reported `bucket(n, col)` transform yields for every row inside. */
final case class GraftBucketInputPartition(bucket: Int,
    files: Array[(String, Long)])
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](bucket))
}

/** Unbucketed fallback: files with no partition-key claim. */
final case class GraftFilesInputPartition(files: Array[(String, Long)])
    extends InputPartition

final class GraftParquetReaderFactory(
    readFunc: PartitionedFile => Iterator[InternalRow])
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val files = partition match {
      case GraftBucketInputPartition(_, fs) => fs
      case GraftFilesInputPartition(fs)     => fs
      case other => throw new IllegalStateException(
        s"unexpected partition ${other.getClass}")
    }
    new GraftFilesPartitionReader(files, readFunc)
  }
}

/** Sequential per-file reader. The parquet read function may hand back
  * vectorized [[org.apache.spark.sql.vectorized.ColumnarBatch]]es
  * masquerading as InternalRow (the FileSourceScanExec contract);
  * those flatten through their row iterator — the exact unwrap
  * ColumnarToRowExec performs. */
final class GraftFilesPartitionReader(files: Array[(String, Long)],
    readFunc: PartitionedFile => Iterator[InternalRow])
    extends PartitionReader[InternalRow] {

  private val fileIt = files.iterator
  private var rows: Iterator[InternalRow] = Iterator.empty
  private var batch: Iterator[InternalRow] = Iterator.empty
  private var current: InternalRow = _

  @annotation.tailrec
  override def next(): Boolean =
    if (batch.hasNext) { current = batch.next(); true }
    else if (rows.hasNext) {
      (rows.next(): Any) match {
        case b: org.apache.spark.sql.vectorized.ColumnarBatch =>
          batch = b.rowIterator().asScala
          next()
        case r: InternalRow => current = r; true
      }
    } else if (fileIt.hasNext) {
      val (p, len) = fileIt.next()
      rows = readFunc(PartitionedFile(
        partitionValues = InternalRow.empty,
        filePath = SparkPath.fromPathString(p),
        start = 0L, length = len,
        locations = Array.empty,
        modificationTime = 0L, fileSize = len))
      next()
    } else false

  override def get(): InternalRow = current
  override def close(): Unit = () // readers close via task listeners
}
