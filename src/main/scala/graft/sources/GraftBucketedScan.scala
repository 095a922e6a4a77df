package graft.sources

import java.util.OptionalLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportPartitioning, SupportsReportStatistics}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.{EqualTo, Filter, In, IsNull}
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** The catalog scan for HASH-BUCKETED graft tables (`PARTITIONED BY
  * (bucket(n, k))`) — the piece that turns the on-disk `_b=<id>` layout
  * into SHUFFLE-FREE JOINS:
  *
  *  - reports `KeyGroupedPartitioning(bucket(n, k), #buckets)`;
  *    Catalyst resolves the transform through [[GraftBucketFunction]]
  *    and `EnsureRequirements` then recognizes two co-bucketed scans as
  *    co-partitioned — a sort-merge join of two 100 TB tables runs with
  *    ZERO Exchange on either side (storage-partitioned join, the DSv2
  *    successor of hive bucketed joins);
  *  - every input partition carries its bucket id as the partition
  *    key, so Spark groups the per-file partitions into one task per
  *    bucket exactly when SPJ engages
  *    (`spark.sql.sources.v2.bucketing.enabled`), and keeps per-file
  *    parallelism otherwise;
  *  - point predicates on the bucket column PRUNE whole buckets
  *    driver-side (`WHERE k = 42` reads 1/n of the files before any
  *    footer is opened), composing with the parquet row-group pruning
  *    the pushed filters buy below.
  *
  * Executors read through Spark's own vectorized parquet reader
  * function (the [[GraftCdfStream]] pattern); pushed filters reach the
  * reader for row-group stat pruning and are ALSO left in the plan as
  * residuals, so correctness never depends on parquet's evaluation.
  */
private[sources] class GraftBucketedScanBuilder(spark: SparkSession,
    table: String, version: Int, schema: StructType,
    bucketCol: String, numBuckets: Int)
  extends ScanBuilder
  with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = schema
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // everything is kept as a residual (Spark re-evaluates above the
    // scan); the conjuncts are handed to parquet for row-group pruning
    // and mined for bucket pruning below
    pushed = filters
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Buckets that can hold rows passing ALL pushed conjuncts — None
    * means no bucket-column point predicate, scan all. */
  private def prunedBuckets: Option[Set[Int]] =
    GraftBucketedScan.bucketsFor(pushed.toSeq, bucketCol, dt, numBuckets)

  private def dt = schema(bucketCol).dataType

  override def build(): Scan =
    new GraftBucketedScan(spark, table, version, schema, required,
      pushed.toSeq, bucketCol, numBuckets, prunedBuckets)
}

private[sources] case class GraftBucketPartition(path: String,
    bytes: Long, bucketId: Int, dv: Option[Array[Byte]] = None)
  extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](bucketId))
}

private[sources] class GraftBucketedScan(spark: SparkSession,
    table: String, version: Int, dataSchema: StructType,
    required: StructType, filters: Seq[Filter],
    bucketCol: String, numBuckets: Int, buckets: Option[Set[Int]])
  extends Scan with Batch
  with SupportsReportPartitioning with SupportsReportStatistics
  with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** No pushed conjuncts and no bucket pruning — the whole-version
    * read [[MetadataOnlyAggregates]] may answer from sidecars. */
  private[sources] def filterFree: Boolean =
    filters.isEmpty && buckets.isEmpty

  override def description(): String =
    s"graft-bucketed:$table@v$version bucket($numBuckets, $bucketCol)" +
      buckets.fold("")(b => s" buckets=${b.toSeq.sorted.mkString(",")}")

  // ---- RUNTIME filtering (dynamic partition/file pruning) -----------
  //
  // The DPP handshake: at plan time the optimizer sees the join key in
  // `filterAttributes`; at execution, after the dimension side has
  // materialized (typically as the reused broadcast), BatchScanExec
  // hands the collected key set back as an `In` conjunct. Two tiers of
  // driver-side pruning re-run with it: the key set hashes to a BUCKET
  // id set (whole 1/n slices of a 100 TB fact drop before any task
  // launches), and the per-file stats/bloom sidecars drop files inside
  // the kept buckets. Strictly conservative — both tiers only ever
  // DROP files proven row-free for the keys.
  private var runtime: Seq[Filter] = Nil
  private var partsCache: Array[GraftBucketPartition] = _

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    (bucketCol +: (Sources.statsColumnsOf(table) ++
      Sources.bloomColumnsOf(table))).distinct
      .map(Expressions.column).toArray

  override def filter(fs: Array[Filter]): Unit = {
    runtime = fs.toSeq
    partsCache = null
  }

  // one input partition per (bucket, file): full per-file parallelism
  // on plain scans, grouped to one task per bucket when SPJ engages;
  // pruning composes in tiers — bucket ids from point predicates on the
  // bucket column, then per-file stats/bloom sidecars on everything else
  private lazy val dv = Sources.dvOf(table, version)

  private def parts: Array[GraftBucketPartition] = {
    if (partsCache == null) partsCache = {
      val statsKeep =
        Sources.filterKeeper(table, version, filters ++ runtime)
      val all = Sources.filesOf(table, version).filter(statsKeep).map { f =>
        val b = GraftBucketedScan.bucketIdOf(f).getOrElse(
          throw new IllegalStateException(
            s"bucketed table $table: data file outside a _b=<id> dir: $f " +
              "(the table has non-bucketed batches — it was written " +
              "outside the catalog commit path)"))
        GraftBucketPartition(f,
          java.nio.file.Files.size(java.nio.file.Paths.get(f)), b,
          dv.get(f).map(_.toByteArray))
      }
      val keep = Seq(buckets,
        GraftBucketedScan.bucketsFor(runtime, bucketCol,
          dataSchema(bucketCol).dataType, numBuckets))
        .flatten.reduceOption(_ intersect _)
      keep.fold(all)(ks => all.filter(p => ks.contains(p.bucketId)))
        .sortBy(p => (p.bucketId, p.path)).toArray
    }
    partsCache
  }

  /** Post-runtime-filter planned file count — the spec/gate witness. */
  private[graft] def plannedFileCount: Int = parts.length

  override def planInputPartitions(): Array[InputPartition] =
    parts.toArray[InputPartition]

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      Array(Expressions.bucket(numBuckets, bucketCol)),
      parts.map(_.bucketId).distinct.length)

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(parts.map(_.bytes).sum)
    // exact live rows + HLL-union NDV for EXACTLY the pruned file
    // subset this scan will read (sidecar metadata, never a scan)
    override def numRows(): OptionalLong =
      Sources.rowsForFiles(table, version, parts.map(_.path).toSeq)
        .map(OptionalLong.of).getOrElse(OptionalLong.empty())
    override def columnStats(): java.util.Map[
        org.apache.spark.sql.connector.expressions.NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics] =
      GraftTable.columnStatsForFiles(table, version,
        parts.map(_.path).toSeq)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftBucketedScan.readerFactory(spark, dataSchema, required, filters,
      haveDv = dv.nonEmpty)
}

private[sources] object GraftBucketedScan {
  private val BucketDir = ".*/_b=(\\d+)/[^/]+$".r

  /** Buckets that can hold rows passing ALL the given conjuncts — None
    * means no bucket-column point predicate, scan all. Each conjunct
    * must hold for every surviving row, so intersecting per-conjunct
    * bucket sets is lossless. Shared by the builder (pushed filters)
    * and the scan's RUNTIME filtering (DPP in-sets from a joined
    * dimension). */
  def bucketsFor(filters: Seq[Filter], bucketCol: String,
      dt: org.apache.spark.sql.types.DataType,
      numBuckets: Int): Option[Set[Int]] = {
    def bucketsOf(f: Filter): Option[Set[Int]] = f match {
      case EqualTo(c, v) if c == bucketCol && v != null =>
        Some(Set(GraftBucketFunction.bucketOf(v, dt, numBuckets)))
      case In(c, vs) if c == bucketCol =>
        Some(vs.filter(_ != null)
          .map(GraftBucketFunction.bucketOf(_, dt, numBuckets)).toSet)
      case IsNull(c) if c == bucketCol =>
        // the writer hashes NULL to the seed, so every null-keyed row
        // sits in one known bucket
        Some(Set(GraftBucketFunction.bucketOf(null, dt, numBuckets)))
      case _ => None
    }
    val sets = filters.flatMap(bucketsOf(_))
    if (sets.isEmpty) None else Some(sets.reduce(_ intersect _))
  }

  /** The bucket id a data file was routed to, parsed from its `_b=`
    * directory (the writer's hive layout). */
  def bucketIdOf(path: String): Option[Int] = path match {
    case BucketDir(b) => Some(b.toInt)
    case _ => None
  }

  /** The shared per-file reader construction for the native batch
    * scans (bucketed and plain-DV): Spark's own parquet reader
    * function built once driver-side — pushed conjuncts buy row-group
    * pruning, older-generation files missing ADD COLUMN fields
    * null-fill through schema clipping. The `_gfile`/`_gpos` metadata
    * columns are synthesized reader-side (file path from the
    * partition, position from the row-index generator column), never
    * read from parquet — schema clipping would null-fill them
    * silently otherwise. DV'd positions drop inline via the indexed
    * reader function (positions exact under row-group pruning). */
  def readerFactory(spark: SparkSession, dataSchema: StructType,
      required: StructType, filters: Seq[Filter], haveDv: Boolean,
      rid: Option[Map[String, Long]] = None): PartitionReaderFactory = {
    // lineage tables additionally synthesize `_row_id`: the physical
    // column where a rewrite materialized it, the file range otherwise
    val needRid = rid.isDefined &&
      required.fieldNames.contains(RowIds.COL)
    def isMeta(n: String): Boolean =
      GraftTable.metaColumnNames(n) || (needRid && n == RowIds.COL)
    val hasMeta = required.fieldNames.exists(isMeta)
    val dataFields = required.fields.filterNot(f => isMeta(f.name))
    val dataStruct = StructType(dataFields)
    // never push an id predicate into the parquet reader: files that
    // predate materialization hold NULLs in the physical column, and a
    // row-group prune on those would drop rows whose SYNTHESIZED id
    // matches (Spark re-evaluates all conjuncts above the scan)
    val safeFilters =
      if (!needRid) filters
      else filters.filterNot(_.references.contains(RowIds.COL))
    val fileSchema =
      if (!needRid) dataSchema
      else StructType(dataSchema.fields.filterNot(_.name == RowIds.COL) :+
        org.apache.spark.sql.types.StructField(RowIds.COL,
          org.apache.spark.sql.types.LongType, nullable = true))
    val readFunc = new ParquetFileFormat().buildReaderWithPartitionValues(
      spark, fileSchema, StructType(Nil), dataStruct, safeFilters,
      Map(org.apache.spark.sql.execution.datasources.FileFormat
        .OPTION_RETURNING_BATCH -> "false"),
      spark.sessionState.newHadoopConf())
    val ridPos = if (needRid) dataFields.length else -1
    val readFuncIdx =
      if (!haveDv && !hasMeta) readFunc
      else new ParquetFileFormat().buildReaderWithPartitionValues(
        spark, fileSchema, StructType(Nil),
        StructType(dataFields ++
          (if (needRid) Seq(org.apache.spark.sql.types.StructField(
            RowIds.COL, org.apache.spark.sql.types.LongType,
            nullable = true)) else Nil) :+
          org.apache.spark.sql.types.StructField(
            ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME,
            org.apache.spark.sql.types.LongType, nullable = true)),
        safeFilters,
        Map(org.apache.spark.sql.execution.datasources.FileFormat
          .OPTION_RETURNING_BATCH -> "false"),
        spark.sessionState.newHadoopConf())
    // per-output-field extraction plan: data ordinal, or a metadata tag
    // (-1 = row index, -2 = file path, -3 = lineage id) — the delta
    // scan's shape
    val dataIdx = dataFields.map(_.name).zipWithIndex.toMap
    val fields = required.fields.map { f =>
      f.name match {
        case "_gpos" => (-1, f.dataType)
        case "_gfile" => (-2, f.dataType)
        case n if needRid && n == RowIds.COL => (-3, f.dataType)
        case n => (dataIdx(n), f.dataType)
      }
    }
    new GraftBucketedReaderFactory(readFunc, readFuncIdx, fields, hasMeta,
      ridPos, rid.getOrElse(Map.empty))
  }
}

/** The native DSv2 scan for a DV-carrying UNPARTITIONED table (the
  * common dimension case): the same reader machinery as the bucketed
  * scan — stats/bloom file skipping, inline DV application, metadata
  * columns — minus the bucket grouping, PLUS planner-visible
  * statistics. The V1-wrapped [[GraftDvScanBuilder]] stays for
  * identity/transform-partitioned DV'd tables (their partition values
  * live in paths and need the manifest index to reattach); it cannot
  * report statistics through `V1ScanWrapper`, which is exactly why
  * this scan exists: a nation-sized DV'd dimension must broadcast at
  * PLAN time, not wait for AQE. */
private[sources] class GraftDvBatchScanBuilder(spark: SparkSession,
    table: String, version: Int, schema: StructType)
  extends ScanBuilder
  with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = schema
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // everything residual (Spark re-evaluates above); the conjuncts
    // buy row-group pruning in the reader and stats/bloom file
    // skipping below
    pushed = filters
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new GraftDvBatchScan(spark, table, version, schema, required,
      pushed.toSeq)
}

private[sources] class GraftDvBatchScan(spark: SparkSession,
    table: String, version: Int, dataSchema: StructType,
    required: StructType, filters: Seq[Filter])
  extends Scan with Batch with SupportsReportStatistics
  with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"graft-dv:$table@v$version"

  /** No pushed conjuncts — the whole-version read
    * [[MetadataOnlyAggregates]] may answer from sidecars. */
  private[sources] def filterFree: Boolean = filters.isEmpty

  // runtime (DPP) file pruning: the join-key in-set collected at
  // execution probes the same stats/bloom sidecars the pushed filters
  // did — Databricks' "dynamic file pruning", from metadata alone
  private var runtime: Seq[Filter] = Nil
  private var partsCache: Array[GraftBucketPartition] = _

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    (Sources.statsColumnsOf(table) ++ Sources.bloomColumnsOf(table))
      .distinct.map(Expressions.column).toArray

  override def filter(fs: Array[Filter]): Unit = {
    runtime = fs.toSeq
    partsCache = null
  }

  private lazy val dv = Sources.dvOf(table, version)

  private def parts: Array[GraftBucketPartition] = {
    if (partsCache == null) partsCache = {
      val keep = Sources.filterKeeper(table, version, filters ++ runtime)
      Sources.filesOf(table, version).filter(keep).sorted.map { f =>
        GraftBucketPartition(f,
          java.nio.file.Files.size(java.nio.file.Paths.get(f)), 0,
          dv.get(f).map(_.toByteArray))
      }.toArray
    }
    partsCache
  }

  /** Post-runtime-filter planned file count — the spec/gate witness. */
  private[graft] def plannedFileCount: Int = parts.length

  override def planInputPartitions(): Array[InputPartition] =
    parts.toArray[InputPartition]

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(parts.map(_.bytes).sum)
    // exact live rows + HLL-union NDV for EXACTLY the pruned file
    // subset this scan will read (sidecar metadata, never a scan)
    override def numRows(): OptionalLong =
      Sources.rowsForFiles(table, version, parts.map(_.path).toSeq)
        .map(OptionalLong.of).getOrElse(OptionalLong.empty())
    override def columnStats(): java.util.Map[
        org.apache.spark.sql.connector.expressions.NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics] =
      GraftTable.columnStatsForFiles(table, version,
        parts.map(_.path).toSeq)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftBucketedScan.readerFactory(spark, dataSchema, required, filters,
      haveDv = dv.nonEmpty,
      // resolve the rid map ONLY when the query asked for the id — a
      // plain scan must not pay (or depend on) sidecar derivation
      rid = if (required.fieldNames.contains(RowIds.COL) &&
          RowIds.enabled(table))
        Some(RowIds.ridOf(table, version)._1)
      else None)
}

private[sources] class GraftBucketedReaderFactory(
    readFunc: PartitionedFile => Iterator[InternalRow],
    readFuncIdx: PartitionedFile => Iterator[InternalRow],
    fields: Array[(Int, org.apache.spark.sql.types.DataType)],
    hasMeta: Boolean,
    ridPos: Int = -1,
    ridMap: Map[String, Long] = Map.empty)
  extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GraftBucketPartition]
    val pf = PartitionedFile(
      InternalRow.empty,
      org.apache.spark.paths.SparkPath.fromPathString(gp.path),
      0L, gp.bytes, Array.empty[String], 0L, gp.bytes,
      Map.empty[String, Any])
    if (gp.dv.isEmpty && !hasMeta)
      // fast path: no DV to apply, no metadata column to synthesize —
      // the reader's rows ARE the output rows, zero copying
      new PartitionReader[InternalRow] {
        private val it = readFunc(pf)
        override def next(): Boolean = it.hasNext
        override def get(): InternalRow = it.next()
        override def close(): Unit = ()
      }
    else {
      // merge-on-read / metadata path: the indexed function appends the
      // row-index generator column (riding last, after the data fields
      // and the optional physical lineage column); DV'd positions drop
      // inline, the extraction plan maps data ordinals through and
      // fills -1/-2/-3 with index/path/lineage id
      val bits = gp.dv.map(java.util.BitSet.valueOf)
      val pathU = UTF8String.fromString(gp.path)
      val ridBase: Option[Long] = ridMap.get(gp.path)
      val rowIdxPos = fields.count(_._1 >= 0) + (if (ridPos >= 0) 1 else 0)
      new PartitionReader[InternalRow] {
        private val it = readFuncIdx(pf)
        private var cur: InternalRow = _
        override def next(): Boolean = {
          while (it.hasNext) {
            val r = it.next()
            val alive = bits match {
              case Some(b) =>
                val i = r.getLong(rowIdxPos)
                require(i <= Int.MaxValue,
                  s"row index $i overflows the DV bitset")
                !b.get(i.toInt)
              case None => true
            }
            if (alive) { cur = r; return true }
          }
          false
        }
        override def get(): InternalRow = {
          val out = new GenericInternalRow(fields.length)
          var i = 0
          while (i < fields.length) {
            fields(i) match {
              case (-1, _) => out.update(i, cur.getLong(rowIdxPos))
              case (-2, _) => out.update(i, pathU)
              case (-3, _) => out.update(i,
                if (ridPos >= 0 && !cur.isNullAt(ridPos))
                  java.lang.Long.valueOf(cur.getLong(ridPos))
                else ridBase match {
                  case Some(b) =>
                    java.lang.Long.valueOf(b + cur.getLong(rowIdxPos))
                  case None => null
                })
              case (j, dt) => out.update(i,
                if (cur.isNullAt(j)) null else cur.get(j, dt))
            }
            i += 1
          }
          out
        }
        override def close(): Unit = ()
      }
    }
  }
}
