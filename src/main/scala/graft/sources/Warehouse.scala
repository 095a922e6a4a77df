package graft.sources

import graft.{Canon, Tables}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch star-schema build — the Spark restatement of `createDW.sql`
  * (reference: 5 dims + 1 fact, createDW.sql:2-98) with the keyed-upsert
  * intent of its ON DUPLICATE KEY UPDATE loads (O22/O23) and the N1
  * order-dim bug corrected.
  *
  * Scale design:
  *  - dims are written dedup-by-key (last-write-wins via row_number) —
  *    one shuffle each, all map-side prunable afterwards;
  *  - the fact table is built by joining the fact grain against deduped
  *    dims (FK integrity by construction) and is written partitioned by
  *    order-date month, the natural pruning axis for time-range queries
  *    at 100 TB;
  *  - the FK audit ([[fkAudit]]) is the anti-join emptiness check of
  *    createDW.sql:93-97 (SURVEY.md Q9).
  */
object Warehouse {
  import Canon._

  /** Last-write-wins dedup by key (the upsert intent of
    * createDW.sql:23-26,46-49). */
  def dedupByKey(df: DataFrame, key: String, ordering: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(ordering).desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Build and write all dims + fact under `outDir`. Returns the fact. */
  def build(spark: SparkSession, sfDir: String, outDir: String): DataFrame = {
    val part = dedupByKey(Tables.part(spark, sfDir), "p_partkey", "p_retailprice")
    val supplier = dedupByKey(Tables.supplier(spark, sfDir), "s_suppkey", "s_acctbal")
    val customer = dedupByKey(Tables.customer(spark, sfDir), "c_custkey", "c_acctbal")
    val orders = dedupByKey(Tables.orders(spark, sfDir), "o_orderkey", "o_orderdate")
    val nation = Tables.nation(spark, sfDir)

    part.write.mode(SaveMode.Overwrite).parquet(s"$outDir/dim_part")
    supplier.write.mode(SaveMode.Overwrite).parquet(s"$outDir/dim_supplier")
    customer.write.mode(SaveMode.Overwrite).parquet(s"$outDir/dim_customer")
    orders.write.mode(SaveMode.Overwrite).parquet(s"$outDir/dim_order")
    nation.write.mode(SaveMode.Overwrite).parquet(s"$outDir/dim_nation")

    val fact = Tables.lineitem(spark, sfDir)
      .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(part.select("p_partkey")), col("l_partkey") === col("p_partkey"), "left_semi")
      .join(broadcast(supplier.select("s_suppkey")), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("o_custkey"),
        col("o_orderdate").cast("date").as("order_date"),
        date_format(col("o_orderdate"), "yyyy-MM").as("order_month"),
        col("l_quantity"),
        (dec12(col("l_extendedprice")) * dec12(col("l_quantity")))
          .cast("decimal(18,4)").as("sales"))

    fact.write.mode(SaveMode.Overwrite)
      .partitionBy("order_month")
      .parquet(s"$outDir/fact_sales")
    spark.read.parquet(s"$outDir/fact_sales")
  }

  /** Idempotent month-partition backfill: rewrite ONLY the partitions
    * present in `corrected` (dynamic partition overwrite), leaving
    * every other month's files physically untouched. This is the
    * restatement-ETL pattern — late-arriving or corrected upstream data
    * re-lands its own months, the job is safe to re-run (same input →
    * same partition contents), and the blast radius of a bad backfill
    * is the partition list, not the table. Static overwrite (the
    * default) would DROP every other partition — the classic
    * full-table-wipe footgun this mode exists to prevent; the spec
    * pins both properties (other months' files byte-identical,
    * replay a no-op).
    *
    * At 100 TB: per-partition rewrite cost is proportional to the
    * corrected months only, and because partitions are directories the
    * swap is a metadata operation per month — no read-modify-write of
    * the table. The versioned table ([[Sources.commitVersion]]) layers
    * time travel ON TOP when history must survive the rewrite.
    *
    * Caveat (plain-parquet rule): if `corrected` is DERIVED from the
    * target table, materialize it first (`localCheckpoint`) — the
    * overwrite deletes the very files the lazy plan would re-scan.
    * The versioned table does not have this hazard (readers pin a
    * manifest); it is the price of raw-directory tables. */
  def backfillMonths(spark: SparkSession, corrected: DataFrame,
      outDir: String): Unit = {
    val key = "spark.sql.sources.partitionOverwriteMode"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try corrected.write.mode(SaveMode.Overwrite)
      .partitionBy("order_month")
      .parquet(s"$outDir/fact_sales")
    finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Bucketed layout — the co-located-join scale path: `lineitem` and
    * `orders` are written as catalog tables bucketed (and sorted) on the
    * order key, so every subsequent fact⋈orders join reads both sides
    * already hash-partitioned on the join key and Spark plans it with
    * ZERO shuffle exchanges (asserted in SourcesSpec). At 100 TB this is
    * the difference between re-shuffling 100 TB per query and a one-time
    * layout cost at ingest; bucket count would scale with cluster size
    * (buckets ≈ executors × a small factor), 8 here for local[4] tests.
    */
  def buildBucketed(spark: SparkSession, sfDir: String,
      nBuckets: Int = 8): Unit = {
    Tables.lineitem(spark, sfDir)
      .write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("bkt_lineitem")
    Tables.orders(spark, sfDir)
      .write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("bkt_orders")
  }

  /** Shuffle-free enrichment join over the bucketed layout (run
    * [[buildBucketed]] first). */
  def bucketedJoin(spark: SparkSession): DataFrame =
    spark.table("bkt_lineitem")
      .join(spark.table("bkt_orders"), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("o_custkey"),
        col("o_orderdate"), col("l_quantity"))

  /** Dynamic-partition-pruning query shape: enrich fact rows for the
    * months of one quarter, where the quarter predicate lives on a tiny
    * month DIMENSION — not on the fact. Because `order_month` is the
    * fact's partition column and the dim side is broadcastable, Spark
    * inserts a runtime `dynamicpruning` subquery into the fact scan's
    * PartitionFilters (asserted in SourcesSpec): partitions for other
    * quarters are never read. At 100 TB this is the third leg of the
    * layout story — static pruning for literal predicates, DPP for
    * dim-side predicates, bucketing for join co-location.
    */
  def factForQuarter(spark: SparkSession, outDir: String,
      quarter: String): DataFrame = {
    val months = spark.read.parquet(s"$outDir/dim_order")
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("order_month"))
      .distinct()
      .withColumn("qtr",
        concat(substring(col("order_month"), 1, 4), lit("Q"),
          ceil(substring(col("order_month"), 6, 2).cast("int") / 3).cast("int")))
    spark.read.parquet(s"$outDir/fact_sales")
      .join(broadcast(months.filter(col("qtr") === quarter)), "order_month")
  }

  /** Incremental aggregate maintenance — the materialized-view upkeep
    * operator: a per-(month, flag) sales rollup kept as **mergeable
    * partials** (sum + count; avg is derived at read) so applying a
    * delta batch is `agg(delta) ∪ old → re-agg` over rollup-sized data.
    * At 100 TB the fact table is cold history; the daily delta is the
    * only thing scanned — this is the difference between a minutes-long
    * refresh and a full re-read. Only algebraic aggregates (sum, count,
    * min, max) survive this scheme; holistic ones (exact median) need
    * the base data by definition. */
  def salesRollup(fact: DataFrame): DataFrame =
    fact.groupBy("order_month")
      .agg(sum(col("sales")).cast("decimal(18,4)").as("sum_sales"),
        count(lit(1)).as("n_rows"))

  /** Merge an existing rollup with the rollup of a delta batch. Both
    * sides are rollup-grain (months × flags), so this is a shuffle over
    * dozens of rows regardless of fact size. */
  def mergeRollup(existing: DataFrame, delta: DataFrame): DataFrame =
    existing.unionByName(delta)
      .groupBy("order_month")
      .agg(sum(col("sum_sales")).cast("decimal(18,4)").as("sum_sales"),
        sum(col("n_rows")).as("n_rows"))

  /** Incremental JOIN-view maintenance — the delta rule for a two-table
    * equi-join view V = A ⋈ B given append-only deltas:
    *
    *   ΔV = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB
    *
    * (equivalently ΔA ⋈ B_new ∪ A_old ⋈ ΔB). Returns just ΔV; the
    * caller appends it to the stored view. At 100 TB this is the whole
    * point of a materialized join: each refresh touches |Δ| × join
    * fan-out rows, not |A| × |B| — the deltas are micro-batch-sized
    * (broadcastable), and the two big-side probes (ΔA ⋈ B, A ⋈ ΔB)
    * become broadcast joins with NO shuffle of the base tables at all.
    * Only append deltas are handled here (the fixture's ingest shape);
    * updates/deletes need keyed retraction rows — the q84 CDC path.
    * Correctness (ΔV-append ≡ full recompute on A∪ΔA, B∪ΔB) is proven
    * in ScalaTest on the orders/lineitem tables.
    */
  def incrementalJoinDelta(aOld: DataFrame, aDelta: DataFrame,
      bOld: DataFrame, bDelta: DataFrame, joinCols: Seq[String]): DataFrame = {
    val dA = broadcast(aDelta)
    val dB = broadcast(bDelta)
    dA.join(bOld, joinCols)
      .unionByName(aOld.join(dB, joinCols))
      .unionByName(dA.join(dB, joinCols))
  }

  /** FK-integrity audit: fact rows whose FK has no dim row — must be
    * empty (createDW.sql:93-97). */
  def fkAudit(spark: SparkSession, outDir: String): Map[String, Long] = {
    val fact = spark.read.parquet(s"$outDir/fact_sales")
    def missing(dim: String, dimKey: String, factKey: String): Long =
      fact.join(spark.read.parquet(s"$outDir/$dim"),
        col(factKey) === col(dimKey), "left_anti").count()
    Map(
      "part" -> missing("dim_part", "p_partkey", "l_partkey"),
      "supplier" -> missing("dim_supplier", "s_suppkey", "l_suppkey"),
      "order" -> missing("dim_order", "o_orderkey", "l_orderkey"),
      "customer" -> missing("dim_customer", "c_custkey", "o_custkey"))
  }
}
