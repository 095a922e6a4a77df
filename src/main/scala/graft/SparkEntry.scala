package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{AnalyticOps, DedupOps, GeoOps, GraphOps, LakeOps, RelationalOps, ScaleOps, SkewOps, TemporalOps}
import graft.functions.{MultimodalOps, SimilarityOps, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The full operator inventory (SURVEY.md §2.2 Q1–Q26 plus the dedup /
  * similarity / text / multimodal extensions) is assembled from the
  * operator modules; each [[Query]] carries its own DuckDB oracle SQL
  * when the semantics are exactly SQL-expressible.
  */
object SparkEntry {

  val inventory: Seq[Query] =
    RelationalOps.all ++ AnalyticOps.all ++ SkewOps.all ++ TemporalOps.all ++
      TextOps.all ++ DedupOps.all ++ GraphOps.all ++ GeoOps.all ++
      SimilarityOps.all ++ MultimodalOps.all ++ LakeOps.all ++ ScaleOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The star join is the reference's whole purpose in one plan
    * (HyperJoin enrichment → 5-FK fact rows, createDW.sql:83-98). */
  def entry(spark: SparkSession): DataFrame =
    operators.RelationalOps.q04.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    inventory.map(_.tuple).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    inventory.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
