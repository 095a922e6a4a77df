package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode}
import org.apache.spark.sql.execution.datasources.HadoopFsRelation
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider}
import org.apache.spark.sql.types.StructType

/** The versioned table as a registered Spark data source — the SQL
  * surface the round-2 audit named as the top missing piece: until now
  * the format (commit / time travel / merge / vacuum / CDF,
  * [[Sources]]) was API-only, while the reference's consumption model
  * is SQL-first (inspection queries, createDW.sql:12-15,51-56). With
  * the `META-INF/services` registration, a pure-SQL user writes
  *
  * {{{
  * CREATE TEMPORARY VIEW t USING graft
  *   OPTIONS (path '/data/orders_t', versionAsOf '3');
  * SELECT * FROM t WHERE o_orderkey BETWEEN 100 AND 200
  * }}}
  *
  * and gets the committed version's EXACT file set through the
  * stats-skipping [[ManifestFileIndex]]: the relation below is a
  * [[HadoopFsRelation]] whose FileIndex is the manifest index, so
  * FileSourceStrategy plans a normal vectorized parquet scan
  * (WholeStageCodegen'd, row-group pruning intact) and every predicate
  * Catalyst pushes reaches `listFiles` as `dataFilters` — file skipping
  * with no API in sight (numFiles plan-asserted in SourcesSpec). The
  * DataFrame form `spark.read.format("graft").option("versionAsOf", 3)
  * .load(path)` resolves through the same provider.
  *
  * The served schema is the version's DECLARED schema
  * ([[Sources.schemaOf]]): after an additive evolution, files that
  * predate a column read as nulls (the parquet reader's missing-column
  * contract). A RENAMED column's pre-rename files need per-generation
  * alignment ([[Sources.readVersionEvolved]]) — plain parquet files
  * carry no field IDs, so a single unaligned scan cannot map them (the
  * same reason Delta's column mapping rewrites metadata); the SQL
  * surface documents that boundary instead of guessing.
  *
  * V1 `RelationProvider` rather than a DSv2 `TableProvider` is a
  * deliberate choice, not a shortcut: HadoopFsRelation is the ONE
  * integration point that accepts a custom FileIndex while keeping
  * Spark's whole parquet execution stack; the DSv2 file path
  * (`FileTable`) requires a `PartitioningAwareFileIndex`, whose
  * directory-listing contract a manifest-pinned file set exists to
  * replace.
  */
class GraftDataSource extends RelationProvider
    with CreatableRelationProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val params = parameters.map { case (k, v) => k.toLowerCase -> v }
    val table = params.getOrElse("path", throw new IllegalArgumentException(
      "graft datasource: the 'path' option (table root) is required"))
    val version = params.get("versionasof").orElse(params.get("version"))
      .map(_.trim.toInt).getOrElse(-1)
    GraftDataSource.relation(sqlContext.sparkSession, table, version)
  }

  /** The write surface: `df.write.format("graft").mode(m).save(path)`
    * commits through the table format's OCC protocol — Append adds a
    * version carrying the previous file set, Overwrite publishes a
    * replacing version (old versions stay time-travelable; nothing is
    * deleted until vacuum), ErrorIfExists/Ignore consult the manifest
    * history. `option("statsColumns", "a,b")` harvests the min/max
    * skipping sidecar as part of the commit — the write-side half of
    * the read path's file pruning. */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val params = parameters.map { case (k, v) => k.toLowerCase -> v }
    val table = params.getOrElse("path", throw new IllegalArgumentException(
      "graft datasource: the 'path' option (table root) is required"))
    val existing = Sources.latestVersion(table)
    val committed: Option[Int] = mode match {
      case SaveMode.Append =>
        Some(Sources.commitVersion(data, table))
      case SaveMode.Overwrite =>
        Some(Sources.commitVersion(data, table, overwrite = true))
      case SaveMode.ErrorIfExists =>
        if (existing > 0) throw new IllegalStateException(
          s"graft table $table already has $existing committed version(s)")
        Some(Sources.commitVersion(data, table))
      case SaveMode.Ignore =>
        if (existing > 0) None else Some(Sources.commitVersion(data, table))
    }
    committed.foreach { v =>
      params.get("statscolumns").map(_.split(",").map(_.trim).toSeq
        .filter(_.nonEmpty)).filter(_.nonEmpty)
        .foreach(cols =>
          Sources.commitStats(data.sparkSession, table, v, cols))
    }
    GraftDataSource.relation(sqlContext.sparkSession, table, -1)
  }
}

object GraftDataSource {

  /** The version-pinned relation: manifest-backed FileIndex + declared
    * schema + Spark's own parquet format. A version carrying deletion
    * vectors instead serves the DV-applying [[DvRelation]] — correct
    * rows first; [[Sources.purgeDv]]/compaction restore this direct
    * HadoopFsRelation fast path. */
  private[sources] def relation(
      spark: org.apache.spark.sql.SparkSession,
      table: String, version: Int): BaseRelation = {
    val v = if (version < 0) Sources.latestVersion(table) else version
    if (Sources.dvOf(table, v).nonEmpty || Sources.eqOf(table, v).nonEmpty)
      new DvRelation(spark, table, v)
    else {
      val index = new ManifestFileIndex(spark, table, v)
      val schema = Sources.schemaOf(spark, table, v)
      HadoopFsRelation(index, StructType(Nil), schema, None,
        new ParquetFileFormat, Map.empty[String, String])(spark)
    }
  }
}

/** The read relation for a DV'd version: rows come from the
  * stats-skipping indexed scan with the deletion-vector filter applied
  * ([[ManifestFileIndex.readVersionIndexed]]). `PrunedFilteredScan`, so
  * Catalyst still hands down the query's column set and predicates —
  * re-applied INSIDE the wrapped DataFrame, where they reach the
  * parquet scan (pushdown) and the manifest index (file skipping); the
  * default `unhandledFilters` keeps Spark re-evaluating everything
  * above, so pushing is purely an optimization. */
private[sources] class DvRelation(
    spark: org.apache.spark.sql.SparkSession,
    table: String, version: Int)
  extends BaseRelation
  with org.apache.spark.sql.sources.PrunedFilteredScan {

  override def sqlContext: SQLContext = spark.sqlContext
  override val schema: StructType = Sources.schemaOf(spark, table, version)

  // the manifest knows the version's exact physical size — without the
  // override the V1 default (spark.sql.defaultSizeInBytes = huge) makes
  // a nation-sized DV'd dimension ineligible for a planner-side
  // broadcast and leaves the join decision to AQE alone
  override def sizeInBytes: Long = Sources.versionBytes(table, version)

  override def buildScan(requiredColumns: Array[String],
      filters: Array[org.apache.spark.sql.sources.Filter])
      : org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = {
    var df = ManifestFileIndex.readVersionIndexed(spark, table, version)
    filters.flatMap(GraftTable.filterToColumn)
      .foreach(c => df = df.filter(c))
    df.select(requiredColumns.toIndexedSeq.map(
      org.apache.spark.sql.functions.col): _*).rdd
  }
}
