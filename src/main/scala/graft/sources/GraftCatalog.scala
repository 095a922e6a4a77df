package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, V1Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.PartitioningAwareFileIndex
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{Filter, InsertableRelation}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The versioned table format as a DataSourceV2 `TableCatalog` — the
  * round-3 audit's top missing surface: catalog IDENTITY, so SQL DML
  * routes to the format's commit protocol with no path strings in user
  * queries. With
  *
  * {{{
  * spark.sql.catalog.g           = graft.sources.GraftCatalog
  * spark.sql.catalog.g.warehouse = /data/warehouse
  * }}}
  *
  * a pure-SQL user writes
  *
  * {{{
  * CREATE TABLE g.orders (o_orderkey BIGINT, ...);
  * INSERT INTO g.orders SELECT ...;            -- OCC append commit
  * INSERT OVERWRITE g.orders SELECT ...;       -- replacing commit
  * DELETE FROM g.orders WHERE o_orderkey < 10; -- file-granular COW
  * SELECT * FROM g.orders VERSION AS OF 3;     -- native time travel
  * }}}
  *
  * and every statement lands on [[Sources]] ([[Sources.commitVersion]],
  * [[Sources.deleteWhere]], [[Sources.createEmptyTable]]) — versions,
  * manifests, stats sidecars, and pinned readers all behave exactly as
  * through the API.
  *
  * Read path: [[GraftTable]] subclasses Spark's own DSv2
  * [[ParquetTable]], overriding ONLY the file index with the manifest-
  * pinned, stats-skipping [[ManifestFileIndex]] — so the scan is
  * Spark's vectorized/codegen'd v2 parquet reader over the committed
  * version's exact file set, with pushed data filters reaching
  * `listFiles` for manifest-stats file skipping (same division of labor
  * as the V1 `USING graft` path, now with catalog identity).
  *
  * Write path: `V1_BATCH_WRITE` capability + [[V1Write]] — the write
  * arrives as a full DataFrame and commits through the OCC protocol.
  * A format whose commit is "publish a manifest naming immutable
  * files" gains nothing from per-task DSv2 commit messages at this
  * granularity; the V1 fallback is the honest integration (Kafka's
  * sink ships the same way).
  */
class GraftCatalog extends TableCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name: spark.sql.catalog.$name.warehouse is required"))
  }

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active

  private def tableDir(ident: Identifier): String =
    (warehouse +: (ident.namespace() :+ ident.name()).toSeq).mkString("/")

  override def tableExists(ident: Identifier): Boolean =
    Sources.latestVersion(tableDir(ident)) > 0

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = new java.io.File((warehouse +: namespace.toSeq).mkString("/"))
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && Sources.latestVersion(d.getPath) > 0)
      .map(d => Identifier.of(namespace, d.getName))
  }

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    new GraftTable(spark, tableDir(ident), -1)
  }

  /** `SELECT ... FROM g.t VERSION AS OF <n>` — SQL time travel straight
    * off the manifest history. */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    new GraftTable(spark, tableDir(ident), version.trim.toInt)
  }

  /** `TIMESTAMP AS OF` — latest version whose manifest was published at
    * or before the timestamp (micros since epoch, per the DSv2
    * contract). */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val dir = tableDir(ident)
    val millis = timestamp / 1000L
    val v = Sources.history(spark, dir).collect()
      .filter(_.getTimestamp(4).getTime <= millis)
      .map(_.getInt(0)).maxOption.getOrElse(
        throw new NoSuchTableException(ident))
    new GraftTable(spark, dir, v)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    require(partitions.isEmpty,
      "graft tables cluster via range/z-order layout, not directory partitions")
    Sources.createEmptyTable(tableDir(ident), schema)
    new GraftTable(spark, tableDir(ident), -1)
  }

  /** ALTER TABLE: additive schema changes publish the current file set
    * under the evolved declared schema as a new version — a pure
    * metadata commit, zero data movement, old versions pinned. */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val dir = tableDir(ident)
    val v = Sources.latestVersion(dir)
    val cur = Sources.schemaOf(spark, dir, v)
    val next = changes.foldLeft(cur) {
      case (s, add: TableChange.AddColumn) =>
        require(add.fieldNames().length == 1,
          "nested ADD COLUMN is not supported")
        s.add(add.fieldNames().head, add.dataType(), nullable = true)
      case (s, rn: TableChange.RenameColumn) =>
        require(rn.fieldNames().length == 1,
          "nested RENAME COLUMN is not supported")
        StructType(s.fields.map { f =>
          if (f.name == rn.fieldNames().head)
            f.copy(name = rn.newName(),
              metadata = new org.apache.spark.sql.types.MetadataBuilder()
                .withMetadata(f.metadata)
                .putString(Sources.RenamedFrom, f.name).build())
          else f
        })
      case (_, ch) => throw new UnsupportedOperationException(
        s"graft ALTER TABLE does not support $ch")
    }
    Sources.alterSchema(dir, next)
    new GraftTable(spark, dir, -1)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = java.nio.file.Paths.get(tableDir(ident))
    if (!java.nio.file.Files.exists(dir)) false
    else {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_))
      true
    }
  }

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    java.nio.file.Files.move(
      java.nio.file.Paths.get(tableDir(oldIdent)),
      java.nio.file.Paths.get(tableDir(newIdent)))
  }
}

/** One committed version of a graft table on the DSv2 surface: Spark's
  * v2 parquet SCAN (composed, not inherited — extending `FileTable`
  * trips the analyzer's `FallBackFileSourceV2` rule, which rewrites
  * INSERTs into any FileTable back to a raw directory write and would
  * bypass the manifest commit entirely) over the manifest-pinned
  * stats-skipping file index, a V1-fallback OCC write, and
  * file-granular SQL DELETE. */
class GraftTable(spark: SparkSession, path: String, version: Int)
  extends Table with SupportsRead with SupportsWrite with SupportsDelete {

  private val pinned =
    if (version < 0) Sources.latestVersion(path) else version

  override def name(): String =
    s"graft:$path" + (if (version > 0) s"@v$version" else "")

  override lazy val schema: StructType = Sources.schemaOf(spark, path, pinned)

  lazy val fileIndex: PartitioningAwareFileIndex =
    new ManifestFileIndex(spark, path, pinned)

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE,
      TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder =
    new org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder(
      spark, fileIndex, schema, schema,
      new CaseInsensitiveStringMap(util.Map.of()))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder(path)

  // ---- DELETE FROM g.t WHERE ... ------------------------------------

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    filters.forall(f => GraftTable.filterToColumn(f).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    val cond = filters.flatMap(GraftTable.filterToColumn)
      .reduceOption(_ && _).getOrElse(lit(true))
    val v = Sources.latestVersion(path)
    val num = Sources.statsOf(path, v)
    val str = Sources.statsOfString(path, v)
    Sources.deleteWhere(spark, path, cond,
      file => filters.forall(f => GraftTable.fileMayMatch(f, file, num, str)))
  }

  override def truncateTable(): Boolean = {
    // an empty replacing commit: history intact, latest version empty
    val schema = Sources.schemaOf(spark, path, Sources.latestVersion(path))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    Sources.commitVersion(empty, path, overwrite = true)
    true
  }
}

object GraftTable {

  /** V1 `Filter` → `Column`, total over the shapes Spark pushes for
    * DELETE; a None makes `canDeleteWhere` refuse (Spark then reports
    * the delete as unsupported rather than running a wrong one). */
  private[sources] def filterToColumn(f: Filter): Option[org.apache.spark.sql.Column] = f match {
    case sources.EqualTo(a, v) => Some(col(a) === lit(v))
    case sources.EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case sources.GreaterThan(a, v) => Some(col(a) > lit(v))
    case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case sources.LessThan(a, v) => Some(col(a) < lit(v))
    case sources.LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case sources.In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case sources.IsNull(a) => Some(col(a).isNull)
    case sources.IsNotNull(a) => Some(col(a).isNotNull)
    case sources.StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case sources.StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case sources.StringContains(a, v) => Some(col(a).contains(v))
    case sources.And(l, r) =>
      for (lc <- filterToColumn(l); rc <- filterToColumn(r)) yield lc && rc
    case sources.Or(l, r) =>
      for (lc <- filterToColumn(l); rc <- filterToColumn(r)) yield lc || rc
    case sources.Not(c) => filterToColumn(c).map(!_)
    case sources.AlwaysTrue() => Some(lit(true))
    case sources.AlwaysFalse() => Some(lit(false))
    case _ => None
  }

  /** Conservative per-file reachability of a delete predicate from the
    * stats sidecar: false ONLY when stats prove no row of `file` can
    * match `f` — those files are carried untouched (the file-granular
    * half of SQL DELETE). Unknown shapes and unstatted columns return
    * true (file rewritten; correctness never depends on stats). */
  private[sources] def fileMayMatch(f: Filter, file: String,
      num: Map[(String, String), (BigDecimal, BigDecimal)],
      str: Map[(String, String), (String, String)]): Boolean = {
    def numBound(a: String): Option[(BigDecimal, BigDecimal)] =
      num.get((file, a))
    def toBig(v: Any): Option[BigDecimal] = v match {
      case null => None
      case x: Byte => Some(BigDecimal(x.toInt))
      case x: Short => Some(BigDecimal(x.toInt))
      case x: Int => Some(BigDecimal(x))
      case x: Long => Some(BigDecimal(x))
      case x: Float => Some(BigDecimal(x.toDouble))
      case x: Double => Some(BigDecimal(x))
      case x: java.math.BigDecimal => Some(BigDecimal(x))
      case _ => None
    }
    def cmp(a: String, v: Any)(
        possible: ((BigDecimal, BigDecimal), BigDecimal) => Boolean): Boolean =
      (numBound(a), toBig(v)) match {
        case (Some(b), Some(x)) => possible(b, x)
        case _ => v match {
          case s: String => str.get((file, a)) match {
            case Some((mn, mx)) => possibleStr(f, mn, mx, s)
            case None => true
          }
          case _ => true
        }
      }
    def possibleStr(f: Filter, mn: String, mx: String, s: String): Boolean =
      f match {
        case sources.EqualTo(_, _) => mn.compareTo(s) <= 0 && mx.compareTo(s) >= 0
        case sources.GreaterThan(_, _) => mx.compareTo(s) > 0
        case sources.GreaterThanOrEqual(_, _) => mx.compareTo(s) >= 0
        case sources.LessThan(_, _) => mn.compareTo(s) < 0
        case sources.LessThanOrEqual(_, _) => mn.compareTo(s) <= 0
        case _ => true
      }
    f match {
      case sources.EqualTo(a, v) =>
        cmp(a, v) { case ((mn, mx), x) => mn <= x && x <= mx }
      case sources.GreaterThan(a, v) =>
        cmp(a, v) { case ((_, mx), x) => mx > x }
      case sources.GreaterThanOrEqual(a, v) =>
        cmp(a, v) { case ((_, mx), x) => mx >= x }
      case sources.LessThan(a, v) =>
        cmp(a, v) { case ((mn, _), x) => mn < x }
      case sources.LessThanOrEqual(a, v) =>
        cmp(a, v) { case ((mn, _), x) => mn <= x }
      case sources.In(a, vs) =>
        vs.exists(v => cmp(a, v) { case ((mn, mx), x) => mn <= x && x <= mx })
      case sources.And(l, r) =>
        fileMayMatch(l, file, num, str) && fileMayMatch(r, file, num, str)
      case sources.Or(l, r) =>
        fileMayMatch(l, file, num, str) || fileMayMatch(r, file, num, str)
      case _ => true
    }
  }
}

/** Append/overwrite through the format's OCC commit — the V1 write
  * fallback ([[V1Write]]): Spark hands over the full query DataFrame
  * and the commit is one manifest publish. `INSERT INTO` appends;
  * `INSERT OVERWRITE` arrives through [[SupportsOverwrite]] (truncate
  * ≡ overwrite-by-AlwaysTrue) and publishes a replacing version — old
  * versions stay time-travelable either way. */
private[sources] class GraftWriteBuilder(table: String)
  extends WriteBuilder
  with org.apache.spark.sql.connector.write.SupportsOverwrite {

  private var replace = false

  override def truncate(): WriteBuilder = { replace = true; this }

  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    require(filters.forall {
      case sources.AlwaysTrue() => true
      case _ => false
    }, "graft INSERT OVERWRITE supports full-table overwrite only " +
      "(partition-filter overwrite needs directory partitions, which " +
      "the format replaces with range/z-order clustering)")
    replace = true
    this
  }

  override def build(): org.apache.spark.sql.connector.write.Write =
    new V1Write {
      override def toInsertableRelation: InsertableRelation =
        (data: org.apache.spark.sql.DataFrame, _: Boolean) =>
          Sources.commitVersion(data, table, overwrite = replace)
    }
}
