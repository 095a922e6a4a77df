package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.connector.catalog.{Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The table format's change data feed as a STRUCTURED STREAMING
  * source — the loop that closes commit → delta → incremental
  * consumer. [[Sources.readChanges]] already derives a version range's
  * delta purely from manifest diffs (files that left the set are
  * deletes, files that joined are inserts, carried files contribute
  * nothing); this source turns that into a `MicroBatchStream` whose
  * OFFSETS ARE VERSION NUMBERS:
  *
  * {{{
  * spark.readStream.format("graft-cdf")
  *   .option("path", table)            // .option("startingVersion", 3)
  *   .load()                           // schema + _change_type + _commit_version
  *   .writeStream.trigger(Trigger.AvailableNow) ...
  * }}}
  *
  * Each micro-batch covers `(startVersion, endVersion]`: the planner
  * walks the manifests driver-side (KB metadata, no data IO), emits
  * one input partition per changed FILE tagged with its change type
  * and commit version, and executors read the parquet through Spark's
  * own reader — the metadata columns ride along via a JoinedRow, so
  * feed size is O(changed files) and a checkpoint restart resumes at
  * the recorded version exactly. Delta's CDF readStream is the same
  * contract; here it falls out of immutable files + versioned
  * manifests alone.
  *
  * Retention contract: [[Sources.vacuumVersions]] bounds time travel —
  * and therefore REPLAY — to its kept horizon. A consumer lagging past
  * vacuumed versions fails loudly on the missing files (the Delta
  * behavior; silently skipping vacuumed deltas would corrupt every
  * downstream incremental state). Operate vacuum's `keepLast` above
  * the slowest consumer's lag, same as any log-compacted feed.
  */
class GraftCdfDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-cdf"

  private def tableOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(throw new IllegalArgumentException(
      "graft-cdf: the 'path' option (table root) is required"))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftCdfDataSource.cdfSchema(
      Sources.schemaOf(SparkSession.active, tableOf(options),
        Sources.latestVersion(tableOf(options))))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    new GraftCdfTable(SparkSession.active, tableOf(options),
      Option(options.get("startingVersion")).map(_.trim.toInt).getOrElse(0))
  }
}

object GraftCdfDataSource {
  /** Data schema + the two CDF metadata columns. */
  def cdfSchema(data: StructType): StructType =
    data.add("_change_type", StringType, nullable = false)
      .add("_commit_version", LongType, nullable = false)
}

private[sources] class GraftCdfTable(spark: SparkSession, table: String,
    startingVersion: Int) extends Table
  with org.apache.spark.sql.connector.catalog.SupportsRead {

  private val dataSchema =
    Sources.schemaOf(spark, table, Sources.latestVersion(table))

  override def name(): String = s"graft-cdf:$table"
  override def schema(): StructType = GraftCdfDataSource.cdfSchema(dataSchema)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = schema()
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new GraftCdfStream(spark, table, dataSchema, startingVersion)
    }
}

private[sources] case class GraftCdfOffset(version: Int) extends Offset {
  override def json(): String = version.toString
}

private[sources] case class GraftCdfPartition(path: String, bytes: Long,
    changeType: String, version: Int) extends InputPartition

private[sources] class GraftCdfStream(spark: SparkSession, table: String,
    dataSchema: StructType, startingVersion: Int) extends MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  override def initialOffset(): Offset = GraftCdfOffset(startingVersion)

  // Trigger.AvailableNow contract: pin the end offset at prepare time
  // so the run drains exactly the versions that existed when it
  // started, then terminates — commits racing in mid-run wait for the
  // next run (their versions are stable offsets, nothing is lost)
  private var availableNowCap: Option[Int] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(Sources.latestVersion(table))

  override def latestOffset(): Offset =
    GraftCdfOffset(availableNowCap.getOrElse(Sources.latestVersion(table)))

  // SupportsAdmissionControl (super-interface of AvailableNow): this
  // source takes no read limits — a version is the natural batch unit
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset =
    latestOffset()

  override def deserializeOffset(json: String): Offset =
    GraftCdfOffset(json.trim.toInt)

  /** One partition per changed file of every version in
    * `(start, end]` — manifest walking only, no data IO. */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftCdfOffset].version
    val e = end.asInstanceOf[GraftCdfOffset].version
    (s + 1 to e).flatMap { v =>
      val before =
        if (v <= 1) Set.empty[String]
        else Sources.filesOf(table, v - 1).toSet
      val after = Sources.filesOf(table, v).toSet
      def size(f: String): Long =
        java.nio.file.Files.size(java.nio.file.Paths.get(f))
      (after -- before).toSeq.sorted.map(f =>
        GraftCdfPartition(f, size(f), "insert", v)) ++
        (before -- after).toSeq.sorted.map(f =>
          GraftCdfPartition(f, size(f), "delete", v))
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // Spark's own parquet reader function: built once on the driver
    // (it broadcasts the hadoop conf itself), serialized to tasks
    val readFunc = new ParquetFileFormat().buildReaderWithPartitionValues(
      spark, dataSchema, StructType(Nil), dataSchema, Nil,
      // row-based iteration: this reader feeds a JoinedRow per record,
      // not a ColumnarBatch consumer
      Map(org.apache.spark.sql.execution.datasources.FileFormat
        .OPTION_RETURNING_BATCH -> "false"),
      spark.sessionState.newHadoopConf())
    new GraftCdfReaderFactory(readFunc)
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] class GraftCdfReaderFactory(
    readFunc: PartitionedFile => Iterator[InternalRow])
  extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GraftCdfPartition]
    val pf = PartitionedFile(
      InternalRow.empty,
      org.apache.spark.paths.SparkPath.fromPathString(gp.path),
      0L, gp.bytes, Array.empty[String], 0L, gp.bytes,
      Map.empty[String, Any])
    val meta = new GenericInternalRow(Array[Any](
      UTF8String.fromString(gp.changeType), gp.version.toLong))
    val joined = new JoinedRow
    new PartitionReader[InternalRow] {
      private val it = readFunc(pf)
      override def next(): Boolean = it.hasNext
      override def get(): InternalRow = joined(it.next(), meta)
      override def close(): Unit = ()
    }
  }
}
