package graft.operators

import graft.{Canon, Query, Tables}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** At-scale restatements of the inventory's global-window queries.
  *
  * Round-2 audit graded seven exact-rank queries `weak`: each is correct
  * today but funnels fact/entity-grain rows through ONE unpartitioned
  * `Window.orderBy` sort — a single-task bottleneck at 1000-executor
  * scale. The `b` variants here keep the IDENTICAL output contract (six
  * of seven reuse the exact query's DuckDB oracle verbatim and are
  * hash-checked against it) while their physical plans contain NO
  * unpartitioned Window at all (spec-asserted in `ScaleSpec`):
  *
  *  - [[withExactRank]] — exact global row_number by range-bucketing on
  *    sampled composite boundaries + broadcast prefix offsets + a
  *    PARTITIONED per-bucket rank. Boundaries set parallelism, never
  *    semantics: any boundary choice reproduces the global rank bit-for-
  *    bit, which is why the b variants stay oracle-exact. This is the
  *    rank analogue of Spark's own RangePartitioning global sort.
  *  - the distinct-value histogram device (q39b) — ranks read off a
  *    per-group cumulative over the value HISTOGRAM, never the rows.
  *  - local-prune-then-merge (q124b) — per-block skylines (partitioned
  *    window) feed a broadcast anti-join over the tiny candidate union.
  *  - grain restatement (q157b) — per-source-partition watermark
  *    lateness, the grain Kafka actually guarantees order on.
  */
object ScaleOps {

  /** Driver-side comparison for sampled boundary tuples (the sampled
    * types are exactly the sort-key types the inventory uses). */
  private def cmpAny(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Long)       => java.lang.Long.compare(x, y)
    case (x: Int, y: Int)         => Integer.compare(x, y)
    case (x: Double, y: Double)   => java.lang.Double.compare(x, y)
    case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.compareTo(y)
    case (x: String, y: String)   => x.compareTo(y)
    case (x: java.sql.Date, y: java.sql.Date) => x.compareTo(y)
    case (x: java.sql.Timestamp, y: java.sql.Timestamp) => x.compareTo(y)
    case _ => 0
  }

  /** Exact global `row_number()` over `order` WITHOUT an unpartitioned
    * window: sample composite (value…, tiebreak) boundary tuples, bucket
    * every row by how many boundaries precede it (a pure codegen'd
    * comparison chain), compute per-bucket counts once (B bounded rows —
    * broadcast-model state, the IVF-centroid pattern), and add each
    * bucket's prefix offset to a bucket-PARTITIONED local rank.
    *
    * Output-identical to `row_number().over(Window.orderBy(order…))` for
    * ANY boundary sample because the buckets tile the total order: the
    * last `order` column must therefore be a unique tiebreak (every
    * call site uses the entity key). Cost: one bounded sample scan + one
    * count scan + the rank scan — the honest price of exact global ranks
    * at 100 TB, where the single-sort alternative simply does not run.
    */
  def withExactRank(
      df: DataFrame,
      rankCol: String,
      order: Seq[(String, Boolean)],
      buckets: Int = 32,
      sampleFraction: Double = 0.05): DataFrame = {
    val cols = order.map { case (c, _) => col(c) }
    val sortCols = order.map { case (c, asc) =>
      if (asc) col(c).asc else col(c).desc
    }
    // null-aware, matching Spark's default null ordering: asc → NULLS
    // FIRST, desc → NULLS LAST (so a NULL key is the sort-order minimum
    // under asc and the maximum under desc, in BOTH the driver-side
    // sample sort and the codegen'd bucket predicate below — a
    // direction-dependent rule, which is why it cannot live in cmpAny)
    def rowLt(a: Row, b: Row): Boolean = {
      var i = 0
      while (i < order.length) {
        val asc = order(i)._2
        val an = a.isNullAt(i); val bn = b.isNullAt(i)
        if (an || bn) {
          if (an != bn) return if (asc) an else bn
          // both null: tied on this column, fall through
        } else {
          val c = cmpAny(a.get(i), b.get(i))
          val signed = if (asc) c else -c
          if (signed != 0) return signed < 0
        }
        i += 1
      }
      false
    }
    val sample = df.select(cols: _*)
      .sample(withReplacement = false, sampleFraction, 42L)
      .limit(buckets * 4096).collect().sortWith(rowLt)
    val step = math.max(1, sample.length / buckets)
    val bnds = (1 until buckets).map(_ * step)
      .filter(_ < sample.length).map(sample).distinct
    // row >= boundary, lexicographic, honoring per-column direction AND
    // null position (asc: NULLS FIRST, desc: NULLS LAST). A NULL row
    // value under asc makes `c > lb` evaluate to NULL, which when(...)
    // counts as 0 — exactly "before every non-null boundary", so that
    // case is correct for free; desc needs the explicit `|| c.isNull`
    // (null sorts AFTER every boundary) and a null BOUNDARY needs its
    // own branch (lit(null) comparisons would void the whole chain).
    def geRow(b: Row): Column = {
      def rec(i: Int): Column =
        if (i == order.length) lit(true)
        else {
          val (name, asc) = order(i)
          val c = col(name)
          if (b.isNullAt(i)) {
            // null boundary sits at the very front (asc) / back (desc)
            val gt = if (asc) c.isNotNull else lit(false)
            gt || (c.isNull && rec(i + 1))
          } else {
            val lb = lit(b.get(i))
            val gt = if (asc) c > lb else (c < lb) || c.isNull
            gt || (c <=> lb && rec(i + 1))
          }
        }
      rec(0)
    }
    val bucketExpr = bnds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(geRow(b), 1).otherwise(0)
    }
    val withB = df.withColumn("__rk_bucket", bucketExpr)
    val counts = withB.groupBy("__rk_bucket").agg(count(lit(1)).as("__c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (b, c) => val o = (b, acc); acc += c; o }
    val offExpr = offsets.foldLeft(lit(0L)) { case (e, (b, o)) =>
      when(col("__rk_bucket") === b, lit(o)).otherwise(e)
    }
    val w = Window.partitionBy("__rk_bucket").orderBy(sortCols: _*)
    withB
      .withColumn(rankCol, row_number().over(w).cast("long") + offExpr)
      .drop("__rk_bucket")
  }

  /** SQL `ntile(k)` from an exact global rank, closed form: the first
    * `n mod k` tiles hold `n div k + 1` rows, the rest `n div k` — the
    * standard-SQL definition, identical in Spark and DuckDB. Pure
    * BIGINT arithmetic so [[withExactRank]] + this = exact ntile with a
    * fully partitioned plan. */
  private def ntileK(rn: String, n: String, k: Int): Column = expr(
    s"""CASE WHEN $rn <= ($n % $k) * (($n DIV $k) + 1)
       |     THEN ($rn + ($n DIV $k)) DIV (($n DIV $k) + 1)
       |     ELSE ($n % $k) + (($rn - ($n % $k) * (($n DIV $k) + 1))
       |                        + ($n DIV $k) - 1) DIV ($n DIV $k)
       |END""".stripMargin)

  /** Q39b — q39's exact per-priority quantiles from the distinct-VALUE
    * histogram: rank r's value is the one whose cumulative count first
    * reaches r, so the only windows run per-priority over the compact
    * (priority, value) histogram — fact rows are touched exactly once,
    * by a combinable groupBy. Same output, same oracle as q39. */
  val q39b = Query(
    "q39b_quantiles_hist",
    (s, dir) => {
      val hist = Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"), col("o_totalprice"))
        .agg(count(lit(1)).as("c"))
      val wCum = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist
        .withColumn("cum", sum(col("c")).over(wCum))
        .withColumn("n",
          sum(col("c")).over(Window.partitionBy("o_orderpriority")))
      def pick(p: Double) = max(when(
        col("cum") - col("c") < ceil(col("n") * p) &&
          ceil(col("n") * p) <= col("cum"), col("o_totalprice")))
      cum.groupBy("o_orderpriority")
        .agg(pick(0.25).as("p25"), pick(0.5).as("p50"), pick(0.75).as("p75"),
          max(col("n")).as("n_rows"))
        .orderBy("o_orderpriority")
    },
    AnalyticOps.q39.oracle)

  /** Q108b — q108's RFM scores with every global ntile replaced by
    * [[withExactRank]] + the [[ntileK]] closed form. Customer-grain base
    * is localCheckpointed once (at cluster scale: persisted) because
    * three rank passes reuse it. Same output, same oracle as q108. */
  val q108b = Query(
    "q108b_rfm_scale",
    (s, dir) => {
      val base = Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate")).as("r_date"),
          count(lit(1)).as("f"),
          Canon.outD(sum(Canon.dec(col("o_totalprice")))).as("m"))
        .localCheckpoint()
      val r1 = withExactRank(base, "r_rn", Seq("r_date" -> false, "o_custkey" -> true))
      val r2 = withExactRank(r1, "f_rn", Seq("f" -> false, "o_custkey" -> true))
      val r3 = withExactRank(r2, "m_rn", Seq("m" -> false, "o_custkey" -> true))
      val nDf = base.agg(count(lit(1)).as("n"))
      r3.crossJoin(broadcast(nDf))
        .withColumn("r_score", ntileK("r_rn", "n", 4))
        .withColumn("f_score", ntileK("f_rn", "n", 4))
        .withColumn("m_score", ntileK("m_rn", "n", 4))
        .withColumn("rfm",
          concat(col("r_score"), col("f_score"), col("m_score")))
        .select("o_custkey", "r_date", "f", "m", "r_score", "f_score",
          "m_score", "rfm")
        .orderBy("o_custkey")
    },
    AnalyticOps.q108.oracle)

  /** Q115b — q115's Lorenz/Gini readout with the customer-spend rank
    * from [[withExactRank]]; every downstream expression is q115's
    * verbatim, so the decimal/double discipline is inherited. Same
    * output, same oracle as q115. */
  val q115b = Query(
    "q115b_gini_scale",
    (s, dir) => {
      val spend = Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(sum(Canon.dec(col("o_totalprice"))).as("m_dec"))
        .localCheckpoint()
      val ranked = withExactRank(spend, "i",
          Seq("m_dec" -> true, "o_custkey" -> true))
        .withColumn("m", Canon.outD(col("m_dec")))
      val tot = ranked.groupBy()
        .agg(count(lit(1)).as("n"),
          Canon.outD(sum(col("m_dec"))).as("t"),
          sum(col("m_dec") * col("i")).cast("decimal(18,0)").cast("double")
            .as("wt"))
        .withColumn("gini",
          lit(2.0) * col("wt") / (col("n").cast("double") * col("t")) -
            (col("n") + 1).cast("double") / col("n").cast("double"))
      ranked.crossJoin(broadcast(tot))
        .withColumn("decile",
          least(lit(9L), floor(((col("i") - 1) * 10).cast("double") /
            col("n").cast("double")).cast("long")))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_cust"),
          Canon.outD(sum(col("m_dec"))).as("spend"),
          max(col("t")).as("t"), max(col("gini")).as("gini"))
        .withColumn("spend_share", col("spend") / col("t"))
        .select("decile", "n_cust", "spend", "spend_share", "gini")
        .orderBy("decile")
    },
    AnalyticOps.q115.oracle)

  /** Q124b — q124's skyline by local-prune-then-merge: per-block
    * skylines (all windows PARTITIONED by block) are a superset of the
    * global skyline, so the final dominance test is a broadcast
    * anti-join over the tiny candidate union — the classic distributed
    * skyline. Same output, same oracle as q124. */
  val q124b = Query(
    "q124b_skyline_scale",
    (s, dir) => {
      val pts = Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(max(Canon.dec(col("o_totalprice"))).as("spend_dec"),
          count(lit(1)).as("n_orders"))
      val bucketed = pts.withColumn("__blk", pmod(col("o_custkey"), lit(16)))
      val perS = bucketed.groupBy("__blk", "spend_dec")
        .agg(max(col("n_orders")).as("g"))
      val w = Window.partitionBy("__blk").orderBy(col("spend_dec").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val withPrev = perS.withColumn("prevmax", max(col("g")).over(w))
      val cand = bucketed.join(withPrev, Seq("__blk", "spend_dec"))
        .filter((col("prevmax").isNull || col("prevmax") < col("n_orders")) &&
          col("n_orders") === col("g"))
        .select(col("o_custkey"), col("spend_dec"), col("n_orders"))
      val candQ = cand.select(col("spend_dec").as("q_spend"),
        col("n_orders").as("q_n"))
      cand.join(broadcast(candQ),
          col("q_spend") >= col("spend_dec") &&
            col("q_n") >= col("n_orders") &&
            (col("q_spend") > col("spend_dec") ||
              col("q_n") > col("n_orders")),
          "left_anti")
        .select(col("o_custkey"),
          Canon.outD(col("spend_dec")).as("best_order"), col("n_orders"))
        .orderBy("o_custkey")
    },
    AnalyticOps.q124.oracle)

  /** Q157b — q157's watermark-lateness audit at the grain a cluster
    * actually observes: Kafka orders events only WITHIN a source
    * partition, so the high-water mark and lateness histogram are
    * per-partition (pid = md5(user_id) mod 8, the keyed-partitioner
    * model). The running-max window is partitioned by pid — no global
    * arrival-order sort exists at scale, so none is computed. New
    * output grain (pid, bucket), own oracle. */
  val q157b = Query(
    "q157b_late_data_partitioned",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("es", expr("ts div 1000000000"))
        .withColumn("pid",
          Canon.md5Residue(col("user_id").cast("string"), 8L))
        .select(col("pid"), col("event_id"), col("es"))
      val w = Window.partitionBy("pid").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("late_s", max(col("es")).over(w) - col("es"))
        .withColumn("bucket_id",
          when(col("late_s") === 0, 0L).when(col("late_s") <= 300, 1L)
            .when(col("late_s") <= 600, 2L).when(col("late_s") <= 1800, 3L)
            .when(col("late_s") <= 3600, 4L).otherwise(5L))
        .groupBy("pid", "bucket_id")
        .agg(count(lit(1)).as("n"), max(col("late_s")).as("max_late_s"))
        .withColumn("bucket",
          element_at(array(lit("on-time"), lit("<=5m"), lit("<=10m"),
              lit("<=30m"), lit("<=1h"), lit(">1h")),
            (col("bucket_id") + 1).cast("int")))
        .select("pid", "bucket_id", "bucket", "n", "max_late_s")
        .orderBy("pid", "bucket_id")
    },
    Some("""WITH hw AS (
           |  SELECT event_id,
           |         CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
           |              AS BIGINT) % 8 AS pid,
           |         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es
           |  FROM events),
           |hw2 AS (
           |  SELECT pid, event_id, es,
           |         max(es) OVER (PARTITION BY pid ORDER BY event_id
           |                       ROWS BETWEEN UNBOUNDED PRECEDING
           |                       AND CURRENT ROW) AS hwm
           |  FROM hw),
           |lat AS (
           |  SELECT pid,
           |         CAST(CASE WHEN hwm - es = 0 THEN 0 WHEN hwm - es <= 300 THEN 1
           |              WHEN hwm - es <= 600 THEN 2 WHEN hwm - es <= 1800 THEN 3
           |              WHEN hwm - es <= 3600 THEN 4 ELSE 5 END AS BIGINT) AS bucket_id,
           |         hwm - es AS late_s
           |  FROM hw2)
           |SELECT pid, bucket_id,
           |       (['on-time', '<=5m', '<=10m', '<=30m', '<=1h', '>1h'])[bucket_id + 1]
           |         AS bucket,
           |       CAST(COUNT(*) AS BIGINT) AS n,
           |       CAST(max(late_s) AS BIGINT) AS max_late_s
           |FROM lat GROUP BY pid, bucket_id ORDER BY pid, bucket_id""".stripMargin)
  )

  /** Q161b — q161's equi-depth histogram with the global order-value
    * rank from [[withExactRank]]. Same output, same oracle as q161. */
  val q161b = Query(
    "q161b_equidepth_scale",
    (s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"))
      val n = o.agg(count(lit(1)).as("n_total"))
      withExactRank(o, "rn", Seq("o_totalprice" -> true, "o_orderkey" -> true))
        .crossJoin(broadcast(n))
        .withColumn("bin", expr("((rn - 1) * 10) div n_total"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"),
          Canon.dsum(col("o_totalprice")).as("rev"))
        .orderBy("bin")
    },
    AnalyticOps.q161.oracle)

  /** Q174b — q174's cross-language quantile normalization with the
    * pooled reference ranks from [[withExactRank]] (the per-language
    * percentile window was already partitioned). Same output, same
    * oracle as q174. */
  val q174b = Query(
    "q174b_quantile_normalize_scale",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          length(col("text")).cast("long").as("raw"))
        .localCheckpoint()
      val wl = Window.partitionBy("lang").orderBy("raw", "doc_id")
      val perLang = docs
        .withColumn("r", row_number().over(wl).cast("long"))
        .withColumn("nl", count(lit(1))
          .over(Window.partitionBy("lang")).cast("long"))
        .withColumn("pr_ppm",
          when(col("nl") === 1, lit(0L))
            .otherwise(expr("((r - 1) * 1000000) DIV (nl - 1)")))
      val global = withExactRank(
        docs.select(col("raw").as("g_raw"), col("doc_id").as("g_id")),
        "gr", Seq("g_raw" -> true, "g_id" -> true))
      val n = docs.count()
      perLang
        .withColumn("target_gr",
          expr(s"(pr_ppm * (${n} - 1)) DIV 1000000 + 1"))
        .join(global.select(col("gr"), col("g_raw")),
          col("target_gr") === col("gr"))
        .select(col("doc_id"), col("lang"), col("raw"), col("pr_ppm"),
          col("g_raw").as("calibrated"))
        .orderBy("doc_id")
    },
    graft.functions.TextOps.q174.oracle)

  val all: Seq[Query] =
    Seq(q39b, q108b, q115b, q124b, q157b, q161b, q174b)
}
