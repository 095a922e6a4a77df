package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface beyond the fixture parquet readers in
  * [[graft.Tables]] (SURVEY.md §2.3 scans/sinks rows).
  *
  * The reference reads via JDBC re-scan (O1/O2) and writes via per-tuple
  * JDBC UPDATE (O17–O21); here every format goes through the
  * DataFrameReader/Writer so pushdown, partitioning and vectorization
  * apply uniformly. CSV/JSON always take an explicit schema — inference
  * is a full extra pass over the data, unacceptable at scale.
  */
object Sources {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** JDBC scan with partitioned parallel reads — the scale-correct form
    * of the reference's single-connection `SELECT *` (O1,
    * StreamGeneratorThread.java:53-58). Untested here (no database in
    * the container) but kept to document the intended surface. */
  def readJdbc(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .load()

  /** Schema-evolution read: union the schemas of all parquet footers
    * under `path` (columns added over time arrive as nulls in old
    * files). `mergeSchema` is a footer-only pass — no data scan — but
    * still O(files); production tables pin the merged schema in a
    * catalog instead of re-deriving it per query, so this is the
    * ingest-time tool, not the hot path. */
  def readParquetEvolving(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)
}
