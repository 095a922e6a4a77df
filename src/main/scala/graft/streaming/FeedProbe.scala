package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The shared per-drain ingestion probe of the doc-keyed store
  * maintainers ([[DedupStore]], [[NearDupStore]]): ONE driver action
  * computing the emptiness check, the high-water mark, and the
  * doc_id-uniqueness guard (a doc_id committed twice in one version is
  * ambiguous under replay — keyed state cannot tell "second copy
  * inserted" from "same copy replayed" — so ingestion fails loudly).
  * One definition keeps both stores' ingestion contracts in lockstep.
  */
private[streaming] object FeedProbe {

  /** The derived-view replay contract shared by [[ClusterView]] and
    * [[VerdictView]]: the applied high-water version lives in a
    * single `#hw` ledger row (key `hwKey`, value in column `a`) of
    * the view table itself. One definition so the two view
    * maintainers' replay semantics cannot diverge. */
  def appliedHw(spark: org.apache.spark.sql.SparkSession,
      viewTable: String, hwKey: String): Long = {
    val row = graft.sources.Sources.readVersion(spark, viewTable)
      .filter(col("k") === hwKey)
      .agg(max(col("a"))).head
    if (row.isNullAt(0)) 0L else row.getLong(0)
  }

  /** ONE driver action over a replay-filtered view feed: total row
    * count, new high water, and the count of rows in the maintainer's
    * relevant key section. Returns None when the range is empty,
    * otherwise Some((newHw, sectionRows)) — sectionRows == 0 is the
    * ledger-only fast path. */
  def probeSection(fresh: DataFrame,
      sectionPrefix: String): Option[(Long, Long)] = {
    val a = fresh.agg(count(lit(1)).as("n"),
      max(col("_commit_version").cast("long")).as("hw"),
      sum(when(col("k").startsWith(sectionPrefix), 1L).otherwise(0L))
        .as("ns")).head
    if (a.getLong(0) == 0L) None else Some((a.getLong(1), a.getLong(2)))
  }

  /** Returns None when the range carries no changes; otherwise
    * Some(newHw). `who` names the store in the guard's error. */
  def probe(fresh: DataFrame, who: String): Option[Long] = {
    val agg = fresh
      .groupBy(col("_commit_version").cast("long").as("v"), col("doc_id"),
        (col("_change_type") === "insert").as("ins"))
      .agg(count(lit(1)).as("n"))
      .agg(sum(when(col("ins"), col("n")).otherwise(0L)).as("insRows"),
        sum(when(!col("ins"), col("n")).otherwise(0L)).as("delRows"),
        max(when(col("ins"), col("n"))).as("dupes"),
        max(col("v")).as("hw")).head
    val insRows = if (agg.isNullAt(0)) 0L else agg.getLong(0)
    val delRows = if (agg.isNullAt(1)) 0L else agg.getLong(1)
    if (insRows == 0L && delRows == 0L) return None
    require(agg.isNullAt(2) || agg.getLong(2) == 1L,
      s"$who source committed the same doc_id twice in one version — " +
        "live doc_ids must be unique")
    Some(agg.getLong(3))
  }
}
