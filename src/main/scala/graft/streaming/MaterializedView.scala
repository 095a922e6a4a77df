package graft.streaming

import graft.sources.Sources
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** A MATERIALIZED star-join view maintained off the base tables'
  * change feeds — the q04 shape (fact ⋈ dimension) as a first-class
  * graft table that is never recomputed from scratch:
  *
  *  - **fact appends** ([[maintainFactQuery]]): the view's delta for a
  *    fact commit is exactly `ΔF ⋈ D` (the [[graft.sources.Warehouse
  *    .incrementalJoinDelta]] rule with a quiescent dimension side) —
  *    the graft-cdf source hands the maintenance job ONLY the commit's
  *    changed files, the dimension head is broadcast, and the joined
  *    delta appends to the view through one versioned commit. The fact
  *    table's history is never re-scanned: per commit the work is
  *    O(Δfact), the property that makes a 100 TB fact maintainable.
  *  - **dimension updates** ([[maintainDimQuery]]): a dim-key change
  *    invalidates exactly the view rows carrying that key. The
  *    maintenance batch recomputes THOSE rows (view-side filtered read,
  *    re-joined to the new dim rows) and lands them through the
  *    file-granular keyed merge — fact table untouched, view rewrite
  *    bounded by affected files. Dim deletes drop their view rows.
  *
  * Both loops are effectively-once via the query-id-keyed batch ledger
  * (replicateTable's device); the view is itself a graft table — time
  * travel, stats, its own CDF — so downstream consumers can chain. */
object MaterializedView {

  /** Create the view table: declared schema = fact ⋈ dim schema (fact
    * columns then non-key dim columns), empty v1, stats on the fact
    * key so dim-side merges stay file-granular on the fact key too. */
  def init(spark: SparkSession, factTable: String, dimTable: String,
      joinKey: String, factKey: String, viewTable: String): Unit = {
    val f = Sources.readVersion(spark, factTable)
    val d = Sources.readVersion(spark, dimTable)
    val schema = f.join(d, joinKey).schema
    Sources.createEmptyTable(viewTable, schema)
    Sources.writeTableProperties(viewTable,
      Map("stats.columns" -> s"$factKey,$joinKey",
        "mv.fact" -> factTable, "mv.dim" -> dimTable,
        "mv.joinKey" -> joinKey, "mv.factKey" -> factKey))
  }

  private def marker(viewTable: String, checkpoint: String,
      side: String, batchId: Long): java.nio.file.Path =
    java.nio.file.Paths.get(viewTable, "_mv",
      s"$side-${StreamingPipeline.checkpointQueryId(checkpoint)}",
      s"batch-$batchId.done")

  private def claim(m: java.nio.file.Path)(body: => Unit): Unit =
    if (!java.nio.file.Files.exists(m)) {
      body
      java.nio.file.Files.createDirectories(m.getParent)
      java.nio.file.Files.write(m, Array.emptyByteArray)
    }

  /** Tail the FACT table's change feed: each commit's inserted rows
    * join the dimension head (broadcast) and append to the view. The
    * fact side must be append-only (the star-schema fact contract);
    * a non-insert change fails loudly. */
  def maintainFactQuery(spark: SparkSession, factTable: String,
      dimTable: String, joinKey: String, viewTable: String,
      checkpoint: String): StreamingQuery =
    spark.readStream.format("graft-cdf").option("path", factTable).load()
      .writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        claim(marker(viewTable, checkpoint, "fact", batchId)) {
          require(batch.filter(col("_change_type") =!= "insert").isEmpty,
            "materialized view: the fact feed must be append-only")
          val delta = batch.drop("_change_type", "_commit_version")
          if (!delta.isEmpty) {
            val dim = broadcast(Sources.readVersion(spark, dimTable))
            Sources.commitVersion(delta.join(dim, joinKey), viewTable)
            ()
          }
        }
      }
      .start()

  /** Tail the DIMENSION table's change feed: each changed dim key's
    * view rows are recomputed and keyed-merged — upserts refresh the
    * dim attributes on the affected fact rows, dim deletes drop them.
    * Per batch the work is O(affected view rows), file-granular on the
    * view; the FACT table is never touched. */
  def maintainDimQuery(spark: SparkSession, dimTable: String,
      joinKey: String, factKey: String, viewTable: String,
      checkpoint: String): StreamingQuery =
    spark.readStream.format("graft-cdf").option("path", dimTable).load()
      .writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        claim(marker(viewTable, checkpoint, "dim", batchId)) {
          // last change per dim key decides its outcome (CDF apply rule)
          val w = Window.partitionBy(joinKey)
            .orderBy(col("_commit_version").desc,
              when(col("_change_type") === "insert", 1).otherwise(0).desc)
          val last = batch.withColumn("__rn", row_number().over(w))
            .filter(col("__rn") === 1).drop("__rn")
          if (!last.isEmpty) {
            val changedKeys = broadcast(
              last.select(joinKey).distinct())
            val upserted = broadcast(
              last.filter(col("_change_type") === "insert")
                .drop("_change_type", "_commit_version")
                .withColumn("__up", lit(1)))
            val view = Sources.readVersion(spark, viewTable)
            // affected view rows, re-joined to the NEW dim rows: rows
            // whose dim key was deleted find no match and become keyed
            // deletes; the rest refresh their dim attributes
            val dimValueCols = upserted.columns
              .filterNot(c => c == joinKey || c == "__up")
            val factCols = view.columns.filterNot(dimValueCols.contains)
            val affected = view.join(changedKeys, joinKey)
              .select(factCols.map(col).toIndexedSeq: _*)
            val refreshed = affected.join(upserted, Seq(joinKey), "left")
            val changes = refreshed
              .withColumn("op",
                when(col("__up").isNull, "delete").otherwise("upsert"))
              .select((view.columns.map(col) :+ col("op")).toIndexedSeq: _*)
            if (!changes.isEmpty) {
              Sources.mergeVersion(spark, viewTable, changes, factKey)
              ()
            }
          }
        }
      }
      .start()
}
