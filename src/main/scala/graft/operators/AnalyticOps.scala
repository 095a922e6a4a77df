package graft.operators

import graft.{Canon, Query, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytic-surface widening beyond the SURVEY.md §2.2 core: reshaping
  * (pivot/unpivot), exact distributed quantiles, subquery expressions,
  * full-outer joins, reproducible hash sampling, ordered string
  * aggregation, the remaining window/date/string/null/map built-ins and
  * equi-width histograms — the operations the reference's "analysis of
  * customer shopping behavior" mandate (README.md:6) implies but its
  * hand-coded pipeline cannot express.
  *
  * Same engineering rules as [[RelationalOps]]: total ORDER BY on a
  * unique key, money through DECIMAL(18,4), derived ints as BIGINT,
  * doubles only from single IEEE ops both engines perform identically.
  */
object AnalyticOps {
  import Canon._

  private val priorities =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  private val prioAlias =
    Seq("p1_urgent", "p2_high", "p3_medium", "p4_notspec", "p5_low")

  private def ordersNation(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))

  /** Q37 — pivot: revenue per nation × order priority, priorities as
    * columns. Values are declared explicitly so the plan is a single
    * pass (Spark otherwise runs an extra distinct job to discover them —
    * a full shuffle you never want at 100 TB).
    */
  val q37 = Query(
    "q37_pivot",
    (s, dir) => {
      val piv = ordersNation(s, dir)
        .groupBy("n_name")
        .pivot("o_orderpriority", priorities)
        .agg(sum(dec(col("o_totalprice"))))
      piv.select(
        col("n_name") +:
          priorities.zip(prioAlias).map { case (v, a) =>
            col(s"`$v`").cast("decimal(18,4)").cast("double").as(a)
          }: _*)
        .orderBy("n_name")
    },
    Some(s"""SELECT n_name,
            |${priorities.zip(prioAlias).map { case (v, a) =>
              s"  CAST(CAST(SUM(CASE WHEN o_orderpriority = '$v' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DECIMAL(18,4)) AS DOUBLE) AS $a"
            }.mkString(",\n")}
            |FROM orders
            |JOIN customer ON o_custkey = c_custkey
            |JOIN nation   ON c_nationkey = n_nationkey
            |GROUP BY n_name
            |ORDER BY n_name""".stripMargin)
  )

  /** Q38 — unpivot/melt: lineitem measures to long form. The inverse
    * reshape of Q37; pure narrow map work (no shuffle until the output
    * sort). */
  val q38 = Query(
    "q38_unpivot",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_quantity", "l_extendedprice", "l_discount", "l_tax")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
            col("l_suppkey"), col("l_quantity")),
          Array(col("l_extendedprice"), col("l_discount"), col("l_tax")),
          "metric", "value")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_quantity", "metric"),
    Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, metric, value
           |FROM (
           |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
           |         'l_extendedprice' AS metric, l_extendedprice AS value FROM lineitem
           |  UNION ALL
           |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
           |         'l_discount', l_discount FROM lineitem
           |  UNION ALL
           |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
           |         'l_tax', l_tax FROM lineitem) t
           |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, metric""".stripMargin)
  )

  /** Q39 — exact distributed quantiles (p25/p50/p75 of order totals per
    * priority) via the rank-position construction: value at row
    * ceil(p·n) in (value, key) order. Unlike `percentile_approx` this is
    * exact and unlike a global sort it shuffles once on the group key —
    * the per-group sort is what a 1000-executor cluster parallelizes.
    */
  val q39 = Query(
    "q39_quantiles",
    (s, dir) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      val wp = Window.partitionBy("o_orderpriority")
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wp))
        .groupBy("o_orderpriority")
        .agg(
          max(when(col("rn") === ceil(col("n") * 0.25), col("o_totalprice"))).as("p25"),
          max(when(col("rn") === ceil(col("n") * 0.5), col("o_totalprice"))).as("p50"),
          max(when(col("rn") === ceil(col("n") * 0.75), col("o_totalprice"))).as("p75"),
          count(lit(1)).as("n_rows"))
        .orderBy("o_orderpriority")
    },
    Some("""WITH r AS (
           |  SELECT o_orderpriority, o_totalprice,
           |         row_number() OVER (PARTITION BY o_orderpriority
           |                            ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn,
           |         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
           |  FROM orders)
           |SELECT o_orderpriority,
           |       MAX(CASE WHEN rn = ceil(n * 0.25) THEN o_totalprice END) AS p25,
           |       MAX(CASE WHEN rn = ceil(n * 0.5)  THEN o_totalprice END) AS p50,
           |       MAX(CASE WHEN rn = ceil(n * 0.75) THEN o_totalprice END) AS p75,
           |       COUNT(*) AS n_rows
           |FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  )

  /** Q40 — correlated scalar subquery (SQL surface): orders above their
    * customer's average order value. Catalyst decorrelates this into an
    * aggregate + join — the plan a hand-written engine would need bespoke
    * code for. The threshold is computed exact-decimal-to-double so both
    * engines compare bitwise-identical values.
    */
  val q40 = Query(
    "q40_scalar_subquery",
    (s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("sq_orders")
      s.sql(
        """SELECT o_orderkey, o_custkey, o_totalprice
          |FROM sq_orders o
          |WHERE o_totalprice > (
          |  SELECT CAST(CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE)
          |           / CAST(COUNT(*) AS DOUBLE)
          |  FROM sq_orders o2 WHERE o2.o_custkey = o.o_custkey)
          |ORDER BY o_orderkey""".stripMargin)
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice
           |FROM orders o
           |WHERE o_totalprice > (
           |  SELECT CAST(CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE)
           |           / CAST(COUNT(*) AS DOUBLE)
           |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
           |ORDER BY o_orderkey""".stripMargin)
  )

  /** Q41 — full outer join: per-nation customer counts vs supplier
    * counts, nations missing on either side survive with zero fill. */
  val q41 = Query(
    "q41_full_outer",
    (s, dir) => {
      val c = Tables.customer(s, dir)
        .groupBy(col("c_nationkey").as("nk_c"))
        .agg(count(lit(1)).as("n_cust"))
      val sup = Tables.supplier(s, dir)
        .groupBy(col("s_nationkey").as("nk_s"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(sup, col("nk_c") === col("nk_s"), "full")
        .select(
          coalesce(col("nk_c"), col("nk_s")).cast("long").as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy("nationkey")
    },
    Some("""SELECT CAST(COALESCE(c.nk, s.nk) AS BIGINT) AS nationkey,
           |       COALESCE(c.n_cust, 0) AS n_cust,
           |       COALESCE(s.n_supp, 0) AS n_supp
           |FROM      (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
           |FULL JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
           |  ON c.nk = s.nk
           |ORDER BY nationkey""".stripMargin)
  )

  /** Q42 — deterministic hash sampling: ~5% of lineitem chosen by an
    * md5-derived residue of the row key. Unlike `sample()` (RNG, not
    * reproducible across engines/runs/partitionings) this is the
    * restartable, audit-stable sampling a 100 TB pipeline needs, and it
    * is pure map-side work.
    */
  val q42 = Query(
    "q42_hash_sample",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .withColumn("hkey",
          Canon.md5Residue(concat_ws("|",
            col("l_orderkey"), col("l_linenumber"), col("l_partkey")), 20))
        .filter(col("hkey") === 0)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity"),
    Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity
           |FROM lineitem
           |WHERE CAST(concat('0x', substr(md5(concat(l_orderkey, '|', l_linenumber, '|', l_partkey)), 1, 15)) AS BIGINT) % 20 = 0
           |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity""".stripMargin)
  )

  /** Q43 — ordered string aggregation: the distinct market segments per
    * nation as one sorted comma-joined string (the `string_agg` /
    * LISTAGG surface; Spark composes it from collect_set + array_sort +
    * array_join, all partial-aggregatable).
    */
  val q43 = Query(
    "q43_string_agg",
    (s, dir) =>
      ordersNation(s, dir)
        .groupBy("n_name")
        .agg(
          array_join(array_sort(collect_set(col("c_mktsegment"))), ",").as("segments"),
          countDistinct(col("c_mktsegment")).as("n_seg"))
        .orderBy("n_name"),
    Some("""SELECT n_name,
           |       string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
           |       COUNT(DISTINCT c_mktsegment) AS n_seg
           |FROM orders
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation   ON c_nationkey = n_nationkey
           |GROUP BY n_name ORDER BY n_name""".stripMargin)
  )

  /** Q44 — remaining window-function battery: ntile, percent_rank,
    * cume_dist, first/last/nth value over an explicit whole-partition
    * frame (default frames differ across engines; stating ROWS BETWEEN
    * removes the ambiguity).
    */
  val q44 = Query(
    "q44_window_battery",
    (s, dir) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, dir)
        .withColumn("nt", ntile(4).over(w).cast("long"))
        .withColumn("prk", percent_rank().over(w))
        .withColumn("cd", cume_dist().over(w))
        .withColumn("fv", first(col("o_orderkey")).over(wf))
        .withColumn("lv", last(col("o_orderkey")).over(wf))
        .withColumn("nv2", nth_value(col("o_orderkey"), 2).over(wf))
        .select("o_orderkey", "o_orderpriority", "o_totalprice",
          "nt", "prk", "cd", "fv", "lv", "nv2")
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_orderpriority, o_totalprice,
           |       CAST(ntile(4) OVER w AS BIGINT) AS nt,
           |       percent_rank() OVER w AS prk,
           |       cume_dist() OVER w AS cd,
           |       first_value(o_orderkey) OVER wf AS fv,
           |       last_value(o_orderkey) OVER wf AS lv,
           |       nth_value(o_orderkey, 2) OVER wf AS nv2
           |FROM orders
           |WINDOW w  AS (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC, o_orderkey ASC),
           |       wf AS (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC, o_orderkey ASC
           |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           |ORDER BY o_orderkey""".stripMargin)
  )

  /** Q45 — date/time function battery on order dates. Day-of-week is
    * normalized to 0=Sunday (Spark's dayofweek is 1-based, DuckDB's
    * 0-based); week numbers are ISO in both engines.
    */
  val q45 = Query(
    "q45_date_battery",
    (s, dir) =>
      Tables.orders(s, dir)
        .select(
          col("o_orderkey"),
          col("o_orderdate").cast("date").as("d"),
          quarter(col("o_orderdate")).cast("long").as("d_quarter"),
          (dayofweek(col("o_orderdate")) - 1).cast("long").as("d_dow0"),
          dayofyear(col("o_orderdate")).cast("long").as("d_doy"),
          weekofyear(col("o_orderdate")).cast("long").as("d_isoweek"),
          last_day(col("o_orderdate")).cast("date").as("d_lastday"),
          add_months(col("o_orderdate").cast("date"), 2).as("d_addm"),
          date_add(col("o_orderdate").cast("date"), 30).as("d_add30"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
           |  CAST(o_orderdate AS DATE) AS d,
           |  CAST(quarter(o_orderdate) AS BIGINT) AS d_quarter,
           |  CAST(dayofweek(o_orderdate) AS BIGINT) AS d_dow0,
           |  CAST(dayofyear(o_orderdate) AS BIGINT) AS d_doy,
           |  CAST(weekofyear(o_orderdate) AS BIGINT) AS d_isoweek,
           |  last_day(CAST(o_orderdate AS DATE)) AS d_lastday,
           |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS d_addm,
           |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS d_add30
           |FROM orders ORDER BY o_orderkey""".stripMargin)
  )

  /** Q46 — string function battery on part attributes: split_part,
    * reverse, repeat, replace, translate, 1-based substring search. */
  val q46 = Query(
    "q46_string_battery",
    (s, dir) =>
      Tables.part(s, dir)
        .select(
          col("p_partkey"),
          split(col("p_type"), " ").getItem(0).as("s_first"),
          reverse(col("p_brand")).as("s_rev"),
          repeat(col("p_brand"), 2).as("s_rep"),
          regexp_replace(col("p_name"), "a", "@").as("s_repl"),
          translate(col("p_type"), "aeiou", "AEIOU").as("s_trans"),
          instr(col("p_name"), "b").cast("long").as("s_pos"),
          ltrim(rtrim(col("p_name"))).as("s_trim"))
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey,
           |  split_part(p_type, ' ', 1) AS s_first,
           |  reverse(p_brand) AS s_rev,
           |  repeat(p_brand, 2) AS s_rep,
           |  replace(p_name, 'a', '@') AS s_repl,
           |  translate(p_type, 'aeiou', 'AEIOU') AS s_trans,
           |  CAST(strpos(p_name, 'b') AS BIGINT) AS s_pos,
           |  ltrim(rtrim(p_name)) AS s_trim
           |FROM part ORDER BY p_partkey""".stripMargin)
  )

  /** Q47 — null-handling battery: nullif / coalesce / greatest / least
    * and an explicit null flag, over customer balances. */
  val q47 = Query(
    "q47_null_battery",
    (s, dir) =>
      Tables.customer(s, dir)
        .select(
          col("c_custkey"),
          nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_null"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(redacted)"))
            .as("seg_filled"),
          greatest(col("c_acctbal"), lit(0.0)).as("bal_floor"),
          least(col("c_acctbal"), lit(1000.0)).as("bal_cap"),
          col("c_acctbal").isNull.as("bal_isnull"))
        .orderBy("c_custkey"),
    Some("""SELECT c_custkey,
           |  nullif(c_mktsegment, 'BUILDING') AS seg_null,
           |  COALESCE(nullif(c_mktsegment, 'BUILDING'), '(redacted)') AS seg_filled,
           |  greatest(c_acctbal, 0.0) AS bal_floor,
           |  least(c_acctbal, 1000.0) AS bal_cap,
           |  c_acctbal IS NULL AS bal_isnull
           |FROM customer ORDER BY c_custkey""".stripMargin)
  )

  /** Q48 — map construction + explode to long form (MapType surface):
    * each sampled lineitem row fans out to one row per measure. The
    * deterministic q42 hash-sample bounds the output. */
  val q48 = Query(
    "q48_map_explode",
    (s, dir) =>
      q42.build(s, dir)
        .join(broadcast(Tables.part(s, dir).select("p_partkey")),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_quantity"),
          explode(map(
            lit("qty"), col("l_quantity"),
            lit("qty2x"), col("l_quantity") * 2)).as(Seq("mkey", "mval")))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_quantity", "mkey"),
    Some("""WITH samp AS (
           |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity
           |  FROM lineitem
           |  WHERE CAST(concat('0x', substr(md5(concat(l_orderkey, '|', l_linenumber, '|', l_partkey)), 1, 15)) AS BIGINT) % 20 = 0
           |    AND EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey))
           |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, mkey, mval
           |FROM (
           |  SELECT *, 'qty' AS mkey, l_quantity AS mval FROM samp
           |  UNION ALL
           |  SELECT *, 'qty2x', l_quantity * 2 FROM samp) t
           |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, mkey""".stripMargin)
  )

  /** Q49 — equi-width histogram of order totals: constant-width buckets
    * via floor division, one combinable aggregate — the scalable way to
    * histogram 100 TB (no sort, no per-row state). */
  val q49 = Query(
    "q49_histogram",
    (s, dir) =>
      Tables.orders(s, dir)
        .withColumn("bucket", floor(col("o_totalprice") / 50000).cast("long"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_total"))
        .withColumn("lo", (col("bucket") * 50000).cast("long"))
        .select("bucket", "lo", "n", "sum_total")
        .orderBy("bucket"),
    Some("""SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
           |       CAST(floor(o_totalprice / 50000) * 50000 AS BIGINT) AS lo,
           |       COUNT(*) AS n,
           |       CAST(CAST(round(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 4) AS DECIMAL(18,4)) AS DOUBLE) AS sum_total
           |FROM orders
           |GROUP BY 1, 2 ORDER BY bucket""".stripMargin)
  )

  /** Q58 — membership-subquery battery: IN (planned as left semi) and
    * NOT IN (null-aware anti join) in one SQL statement. Catalyst turns
    * both into joins — no per-row subquery execution at any scale. The
    * NOT IN column is non-nullable by schema, so the null-semantics trap
    * (NOT IN over a null-containing set = empty) is not in play. */
  val q58 = Query(
    "q58_in_subquery",
    (s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("inq_orders")
      Tables.customer(s, dir).createOrReplaceTempView("inq_customer")
      Tables.lineitem(s, dir).createOrReplaceTempView("inq_lineitem")
      s.sql(
        """SELECT o_orderkey, o_custkey, o_totalprice
          |FROM inq_orders
          |WHERE o_custkey IN (SELECT c_custkey FROM inq_customer
          |                    WHERE c_mktsegment = 'BUILDING')
          |  AND o_orderkey NOT IN (SELECT l_orderkey FROM inq_lineitem
          |                         WHERE l_quantity > 45)
          |ORDER BY o_orderkey""".stripMargin)
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice
           |FROM orders
           |WHERE o_custkey IN (SELECT c_custkey FROM customer
           |                    WHERE c_mktsegment = 'BUILDING')
           |  AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem
           |                         WHERE l_quantity > 45)
           |ORDER BY o_orderkey""".stripMargin)
  )

  /** Q59 — date-spine generation + gap-filling: a month spine from the
    * order-date range (`sequence` + `explode` — rows from nothing), left
    * joined with per-month order counts so empty months surface as
    * zeros. The spine is bounded by the calendar, not the data — it
    * stays tiny at 100 TB and broadcasts. */
  val q59 = Query(
    "q59_date_spine",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val bounds = o.agg(
        date_trunc("month", min(col("o_orderdate"))).as("lo"),
        date_trunc("month", max(col("o_orderdate"))).as("hi"))
      val spine = bounds
        .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 month")))
          .as("month_ts"))
        .select(col("month_ts").cast("date").as("month_start"))
      val counts = o.groupBy(
          date_trunc("month", col("o_orderdate")).cast("date").as("month_start"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
      spine.join(counts, Seq("month_start"), "left")
        .select(col("month_start"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("revenue"), lit(0.0)).as("revenue"))
        .orderBy("month_start")
    },
    Some("""WITH bounds AS (
           |  SELECT date_trunc('month', MIN(o_orderdate)) AS lo,
           |         date_trunc('month', MAX(o_orderdate)) AS hi
           |  FROM orders),
           |spine AS (
           |  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS DATE) AS month_start
           |  FROM bounds),
           |counts AS (
           |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           |         COUNT(*) AS n_orders,
           |         CAST(CAST(round(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 4) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
           |  FROM orders GROUP BY 1)
           |SELECT s.month_start,
           |       COALESCE(c.n_orders, 0) AS n_orders,
           |       COALESCE(c.revenue, 0.0) AS revenue
           |FROM spine s LEFT JOIN counts c USING (month_start)
           |ORDER BY s.month_start""".stripMargin)
  )

  /** Q60 — multiset set ops: INTERSECT ALL / EXCEPT ALL over customer
    * keys of two order predicates, multiplicities preserved (the ALL
    * variants Q17 deliberately leaves out). Canonicalized by counting
    * per (op, key) — the multiset itself has no deterministic row
    * order. */
  val q60 = Query(
    "q60_setops_all",
    (s, dir) => {
      val a = Tables.orders(s, dir)
        .filter(col("o_totalprice") > 150000).select("o_custkey")
      val b = Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      a.intersectAll(b).withColumn("op", lit("intersect_all"))
        .union(a.exceptAll(b).withColumn("op", lit("except_all")))
        .groupBy("op", "o_custkey")
        .agg(count(lit(1)).as("multiplicity"))
        .orderBy("op", "o_custkey")
    },
    Some("""WITH a AS (SELECT o_custkey FROM orders WHERE o_totalprice > 150000),
           |b AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
           |m AS (
           |  SELECT 'intersect_all' AS op, o_custkey FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
           |  UNION ALL
           |  SELECT 'except_all', o_custkey FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b))
           |SELECT op, o_custkey, COUNT(*) AS multiplicity
           |FROM m GROUP BY op, o_custkey
           |ORDER BY op, o_custkey""".stripMargin)
  )

  /** Q61 — fault-tolerant casting (`try_cast`): malformed and
    * out-of-range inputs become NULL instead of failing the job — the
    * generalization of the reference's REGEXP-validate-then-cast clean
    * (O24, createDW.sql:67-80). On a 100 TB ingest a single bad row
    * must never kill the pipeline; try_cast keeps the error handling
    * row-local and codegen'd. */
  val q61 = Query(
    "q61_try_cast",
    (s, dir) =>
      Tables.part(s, dir)
        .select(
          col("p_partkey"),
          expr("try_cast(p_brand AS INT)").as("c_bad"),
          expr("try_cast(cast(p_size AS STRING) AS INT)").as("c_roundtrip"),
          expr("try_cast(p_size * 10 AS TINYINT)").cast("int").as("c_overflow"),
          expr("try_cast(substring(p_brand, 7) AS INT)").as("c_suffix"))
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey,
           |  TRY_CAST(p_brand AS INT) AS c_bad,
           |  TRY_CAST(CAST(p_size AS VARCHAR) AS INT) AS c_roundtrip,
           |  CAST(TRY_CAST(p_size * 10 AS TINYINT) AS INT) AS c_overflow,
           |  TRY_CAST(substr(p_brand, 7) AS INT) AS c_suffix
           |FROM part ORDER BY p_partkey""".stripMargin)
  )

  /** Q62 — mergeable distinct-count sketches (Apache DataSketches HLL):
    * one sketch per nation, per-nation estimates plus a global estimate
    * from `hll_union_agg` over the stored sketches — WITHOUT re-reading
    * the base data. This is the pre-aggregation pattern that makes
    * distinct-count rollups tractable at 100 TB: sketches are
    * constant-size, partial-aggregatable, and unionable across
    * partitions/days. Estimates are engine-specific → rows-only check;
    * the ScalaTest invariant pins estimate≈exact. */
  val q62 = Query(
    "q62_hll_mergeable",
    (s, dir) => {
      val sk = Tables.customer(s, dir)
        .groupBy(col("c_nationkey").cast("long").as("nationkey"))
        .agg(hll_sketch_agg(col("c_custkey")).as("sk"),
          countDistinct(col("c_custkey")).as("exact"))
      val perNation = sk.select(col("nationkey"),
        hll_sketch_estimate(col("sk")).as("estimate"), col("exact"))
      val global = sk.agg(
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("estimate"),
        sum(col("exact")).as("exact"))
        .select(lit(-1L).as("nationkey"), col("estimate"), col("exact"))
      perNation.union(global).orderBy("nationkey")
    },
    None // sketch estimates are engine-specific by design
  )

  /** Q69 — higher-order array-function battery over the tokenized part
    * name: transform / filter / exists / forall / aggregate / sort +
    * slice, arrays canonicalized to comma-joined strings for the
    * cross-engine hash. All lambdas are per-row, bounded by token
    * count — map-side work at any scale. */
  val q69 = Query(
    "q69_hof_battery",
    (s, dir) => {
      val arr = split(col("p_name"), " ")
      Tables.part(s, dir)
        .select(
          col("p_partkey"),
          concat_ws(",", transform(arr, upper(_))).as("toks_up"),
          concat_ws(",", filter(arr, length(_) > 3)).as("long_toks"),
          exists(arr, _ === "green").as("has_green"),
          forall(arr, length(_) > 2).as("all_gt2"),
          aggregate(arr, lit(0L), (acc, x) => acc + length(x).cast("long"))
            .as("total_chars"),
          concat_ws(",", slice(sort_array(arr), 1, 3)).as("first3_sorted"))
        .orderBy("p_partkey")
    },
    Some("""SELECT p_partkey,
           |  array_to_string(list_transform(string_split(p_name, ' '), x -> upper(x)), ',') AS toks_up,
           |  COALESCE(array_to_string(list_filter(string_split(p_name, ' '), x -> length(x) > 3), ','), '') AS long_toks,
           |  list_contains(string_split(p_name, ' '), 'green') AS has_green,
           |  len(list_filter(string_split(p_name, ' '), x -> length(x) <= 2)) = 0 AS all_gt2,
           |  CAST(list_sum(list_transform(string_split(p_name, ' '), x -> length(x))) AS BIGINT) AS total_chars,
           |  array_to_string(list_sort(string_split(p_name, ' '))[1:3], ',') AS first3_sorted
           |FROM part ORDER BY p_partkey""".stripMargin)
  )

  /** Q70 — null-preserving generator (`explode_outer`): every part
    * keeps a row even when its extracted-token array is empty (plain
    * explode would silently drop it — the classic lost-parent bug in
    * flattening pipelines). The oracle emulates outer-unnest by
    * substituting [NULL] for empty arrays. */
  val q70 = Query(
    "q70_explode_outer",
    (s, dir) => {
      val greens = regexp_extract_all(col("p_name"), lit("green\\w*"), lit(0))
      Tables.part(s, dir)
        .select(col("p_partkey"), explode_outer(greens).as("gtok"))
        .orderBy(col("p_partkey"), col("gtok").asc_nulls_first)
    },
    Some("""SELECT p_partkey, unnest(CASE WHEN len(g) = 0 THEN [NULL] ELSE g END) AS gtok
           |FROM (SELECT p_partkey, regexp_extract_all(p_name, 'green\w*') AS g FROM part)
           |ORDER BY p_partkey, gtok ASC NULLS FIRST""".stripMargin)
  )

  /** Q75 — z-score outlier detection per event_type: flag events whose
    * `value` sits more than 2 sample standard deviations from their
    * group mean — the basic data-quality screen every ingest pipeline
    * runs.
    *
    * Numeric determinism: `stddev_samp` over doubles is
    * order-dependent, so the moments are instead built from EXACT
    * integer sums of value-in-cents (`round(value*100)` — values carry
    * 2 decimals, cents ≤ 10^4, squares ≤ 10^8, so both Σv and Σv² stay
    * far under 2^63 at any fixture scale). From identical integer
    * (n, Σv, Σv²) both engines evaluate the same IEEE double expression
    * tree — division, multiplication, sqrt are exactly-rounded ops — so
    * z is bit-identical before the defensive round(·, 6).
    *
    * Scale shape: one partial+final hash aggregation on event_type
    * (3-row result, broadcast back), then a map-side-only filter — the
    * two-pass mean/variance plan that works at any corpus size.
    */
  val q75 = Query(
    "q75_zscore_outliers",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("v100", round(col("value") * 100, 0).cast("long"))
      val stats = ev.groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("v100")).as("s1"),
          sum(col("v100") * col("v100")).as("s2"))
        .withColumn("nd", col("n").cast("double"))
        .withColumn("s1d", col("s1").cast("double"))
        .withColumn("mean100", col("s1d") / col("nd"))
        .withColumn("sd100",
          sqrt((col("s2").cast("double") - col("s1d") * col("s1d") / col("nd"))
            / (col("nd") - 1)))
        .select("event_type", "mean100", "sd100")
      ev.join(broadcast(stats), "event_type")
        .withColumn("z",
          round((col("v100").cast("double") - col("mean100")) / col("sd100"), 6))
        .filter(abs(col("z")) > 2)
        .select(col("event_id"), col("event_type"), col("value"), col("z"))
        .orderBy("event_id")
    },
    Some("""WITH ev AS (
           |  SELECT event_id, event_type, value,
           |         CAST(round(value * 100, 0) AS BIGINT) AS v100
           |  FROM events),
           |stats AS (
           |  SELECT event_type,
           |         CAST(COUNT(*) AS DOUBLE) AS nd,
           |         CAST(SUM(v100) AS DOUBLE) AS s1d,
           |         CAST(SUM(v100 * v100) AS DOUBLE) AS s2d
           |  FROM ev GROUP BY event_type),
           |sc AS (
           |  SELECT event_type, s1d / nd AS mean100,
           |         sqrt((s2d - s1d * s1d / nd) / (nd - 1)) AS sd100
           |  FROM stats)
           |SELECT event_id, event_type, value,
           |       round((CAST(v100 AS DOUBLE) - mean100) / sd100, 6) AS z
           |FROM ev JOIN sc USING (event_type)
           |WHERE abs(round((CAST(v100 AS DOUBLE) - mean100) / sd100, 6)) > 2
           |ORDER BY event_id""".stripMargin)
  )

  /** Q88 — stratified downsampling: rebalance the corpus to ≈50 docs
    * per language (the language-mixture rebalancing step of every
    * pretraining data recipe). Per-stratum keep-thresholds are derived
    * from the stratum counts in INTEGER arithmetic (threshold‰ =
    * 10000·target/count) and membership is decided by the shared
    * md5-residue hash — fully deterministic, no RNG, both engines
    * compute the identical sample.
    *
    * Scale shape: stratum counts are a tiny partial-combinable
    * aggregation (one row per language) broadcast back onto the corpus;
    * the filter itself is map-side. No corpus-sized shuffle — the 100 TB
    * plan is scan + broadcast-join + filter.
    */
  val q88 = Query(
    "q88_stratified_sample",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val thresholds = docs.groupBy("lang")
        .agg(count(lit(1)).as("cnt"))
        // Column `/` is DOUBLE division — cast back to long so the
        // threshold is the same floor-division integer DuckDB's `//`
        // computes (a fractional threshold admits boundary residues)
        .withColumn("thr",
          least(lit(10000L), (lit(10000L) * 50 / col("cnt")).cast("long")))
      docs.join(broadcast(thresholds), Seq("lang"))
        .filter(Canon.md5Residue(concat(lit("strat:"), col("doc_id")), 10000L)
          < col("thr"))
        .select(col("lang"), col("doc_id"), col("source"))
        .orderBy("lang", "doc_id")
    },
    Some("""WITH thr AS (
           |  SELECT lang, least(10000, 10000 * 50 // COUNT(*)) AS thr
           |  FROM documents GROUP BY lang)
           |SELECT d.lang, d.doc_id, d.source
           |FROM documents d JOIN thr USING (lang)
           |WHERE CAST(concat('0x', substr(md5(concat('strat:', d.doc_id)), 1, 15)) AS BIGINT) % 10000 < thr
           |ORDER BY d.lang, d.doc_id""".stripMargin)
  )

  /** Q89 — deterministic per-group "reservoir": a uniform
    * without-replacement 5-sample per source, selected as the 5 smallest
    * md5 hashes (a bottom-k sketch — the distributed-friendly
    * restatement of reservoir sampling; same keys chosen at any
    * parallelism).
    *
    * Scale shape: computed HIERARCHICALLY — bottom-5 within each of 32
    * hash-salt cells per source, then bottom-5 of those ≤160 survivors —
    * so no single task ever sorts a whole group. A flat per-group window
    * would shuffle every row of a hot source into one task at 100 TB;
    * the two-level tournament caps per-task input at max(cell, 32·k).
    * The oracle states the semantics as the flat one-level rank — the
    * tournament provably selects the same rows.
    */
  val q89 = Query(
    "q89_reservoir_sample",
    (s, dir) => {
      val hashed = Tables.documents(s, dir)
        .withColumn("h", md5(concat(lit("rsv:"), col("doc_id"))))
        .withColumn("cell", Canon.md5Residue(concat(lit("cell:"), col("doc_id")), 32L))
      val wCell = Window.partitionBy("source", "cell").orderBy("h", "doc_id")
      val wSrc = Window.partitionBy("source").orderBy("h", "doc_id")
      hashed
        .withColumn("rkc", row_number().over(wCell))
        .filter(col("rkc") <= 5)
        .withColumn("rk", row_number().over(wSrc).cast("long"))
        .filter(col("rk") <= 5)
        .select(col("source"), col("rk"), col("doc_id"), col("h"))
        .orderBy("source", "rk")
    },
    Some("""WITH h AS (
           |  SELECT source, doc_id, md5(concat('rsv:', doc_id)) AS h
           |  FROM documents),
           |r AS (
           |  SELECT *, row_number() OVER (PARTITION BY source
           |                              ORDER BY h, doc_id) AS rk
           |  FROM h)
           |SELECT source, rk, doc_id, h FROM r WHERE rk <= 5
           |ORDER BY source, rk""".stripMargin)
  )

  /** Q90 — heavy hitters via count-min sketch: per-language top-10
    * tokens with their exact counts AND their CMS estimates, plus the
    * one-sided-error verdict (est ∈ [exact, exact + ε·N] with ε=0.001).
    * The CMS (`count_min_sketch` aggregate, fixed seed → deterministic)
    * is the mergeable fixed-size alternative to the exact (lang, token)
    * aggregation when the token vocabulary itself is too large to hold:
    * sketches are linear, so per-shard sketches merge by array addition
    * without re-reading base data (proven in `SketchSpec`).
    *
    * Scale shape: both the exact counts and the sketches are
    * partial-combinable aggregations over the exploded token stream;
    * the collected sketch map is bounded model state (one ~100 KB
    * sketch per language), the same pattern as the IVF centroids.
    * Rows-only by design (no DuckDB CMS); the spec holds the error
    * bound on every row.
    */
  val q90 = Query(
    "q90_heavy_hitters",
    (s, dir) => {
      import org.apache.spark.util.sketch.CountMinSketch
      val toks = graft.functions.TextOps
        .tokensWithPos(Tables.documents(s, dir))
      val w = Window.partitionBy("lang").orderBy(col("cnt").desc, col("tok"))
      val top = toks.groupBy("lang", "tok")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10)
      val sketches = toks.groupBy("lang")
        .agg(
          count_min_sketch(col("tok"), lit(0.001d), lit(0.99d), lit(42)).as("cms"),
          count(lit(1)).as("n_tokens"))
        .collect()
        .map(r => r.getString(0) ->
          ((CountMinSketch.readFrom(r.getAs[Array[Byte]](1)), r.getLong(2))))
        .toMap
      val rows = top.orderBy("lang", "rk").collect().toSeq.map { r =>
        val (lang, tok) = (r.getString(0), r.getString(1))
        val (cnt, rk) = (r.getLong(2), r.getInt(3))
        val (cms, n) = sketches(lang)
        val est = cms.estimateCount(tok)
        (lang, rk, tok, cnt, est,
          est >= cnt && est <= cnt + math.ceil(0.001 * n).toLong)
      }
      s.createDataFrame(rows)
        .toDF("lang", "rk", "tok", "exact_cnt", "cms_est", "within_bound")
        .orderBy("lang", "rk")
    },
    None
  )

  /** Q91 — mergeable approximate percentiles: per-priority p50/p95/p99
    * of order totals via `percentile_approx` (GK sketch, rank error ≤
    * 1/accuracy). The sketch aggregates partially (map-side combine,
    * no sorted shuffle), which is what replaces q39's exact-rank window
    * at 100 TB — q39 sorts every group, this streams one bounded sketch
    * per group. Rows-only by design (sketch choice is engine-specific);
    * `SketchSpec` pins every estimate inside the guaranteed rank band.
    */
  val q91 = Query(
    "q91_approx_percentile",
    (s, dir) =>
      Tables.orders(s, dir)
        .groupBy("o_orderpriority")
        .agg(
          percentile_approx(col("o_totalprice"),
            array(lit(0.5), lit(0.95), lit(0.99)), lit(10000)).as("ps"),
          count(lit(1)).as("n_rows"))
        .select(col("o_orderpriority"),
          col("ps").getItem(0).as("p50"),
          col("ps").getItem(1).as("p95"),
          col("ps").getItem(2).as("p99"),
          col("n_rows"))
        .orderBy("o_orderpriority"),
    None
  )

  /** Q96 — declarative data-quality audit (the Deequ-style constraint
    * battery every warehouse load gates on): row count, key uniqueness,
    * completeness, value range, and FK referential integrity, each as a
    * (check_name, metric, passed) verdict row. The reference's only
    * integrity tooling is the FK DDL itself (createDW.sql:93-97); this
    * is the executable restatement plus the checks MySQL enforced
    * implicitly.
    *
    * Scale shape: two single-pass combinable aggregates (orders,
    * lineitem) + one anti-join count for the FK check — each a full
    * scan with map-side partial aggregation, no driver collection; the
    * verdict union is constant-sized. All metric divisions are exact
    * IEEE doubles of exact integer counts.
    */
  val q96 = Query(
    "q96_constraints",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
      val oAgg = o.agg(
        count(lit(1)).as("n"),
        countDistinct(col("o_orderkey")).as("nk"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_cust"),
        min(col("o_totalprice")).as("min_tp"))
      val lAgg = l.agg(
        count(lit(1)).as("n"),
        sum(when(col("l_quantity").between(1, 50), 1L).otherwise(0L)).as("in_rng"))
      val fk = l.join(o, l("l_orderkey") === o("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("v"))
      Seq(
        oAgg.select(lit("orders_rowcount").as("check_name"),
          col("n").cast("double").as("metric"), (col("n") > 0).as("passed")),
        oAgg.select(lit("orders_key_unique").as("check_name"),
          (col("nk").cast("double") / col("n").cast("double")).as("metric"),
          (col("nk") === col("n")).as("passed")),
        oAgg.select(lit("orders_custkey_complete").as("check_name"),
          (lit(1.0) - col("null_cust").cast("double") / col("n").cast("double"))
            .as("metric"),
          (col("null_cust") === 0).as("passed")),
        oAgg.select(lit("orders_totalprice_nonneg").as("check_name"),
          col("min_tp").cast("double").as("metric"),
          (col("min_tp") >= 0).as("passed")),
        lAgg.select(lit("lineitem_qty_range").as("check_name"),
          (col("in_rng").cast("double") / col("n").cast("double")).as("metric"),
          (col("in_rng") === col("n")).as("passed")),
        fk.select(lit("lineitem_fk_orders").as("check_name"),
          col("v").cast("double").as("metric"), (col("v") === 0).as("passed"))
      ).reduce(_ union _).orderBy("check_name")
    },
    Some("""WITH o AS (
           |  SELECT COUNT(*) AS n, COUNT(DISTINCT o_orderkey) AS nk,
           |         SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS null_cust,
           |         MIN(o_totalprice) AS min_tp
           |  FROM orders),
           |l AS (
           |  SELECT COUNT(*) AS n,
           |         SUM(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 1 ELSE 0 END) AS in_rng
           |  FROM lineitem),
           |fk AS (
           |  SELECT COUNT(*) AS v FROM lineitem li
           |  WHERE NOT EXISTS (SELECT 1 FROM orders oo WHERE oo.o_orderkey = li.l_orderkey))
           |SELECT * FROM (
           |  SELECT 'orders_rowcount' AS check_name, CAST(n AS DOUBLE) AS metric, n > 0 AS passed FROM o
           |  UNION ALL
           |  SELECT 'orders_key_unique', CAST(nk AS DOUBLE) / CAST(n AS DOUBLE), nk = n FROM o
           |  UNION ALL
           |  SELECT 'orders_custkey_complete',
           |         CAST(1 AS DOUBLE) - CAST(null_cust AS DOUBLE) / CAST(n AS DOUBLE),
           |         null_cust = 0 FROM o
           |  UNION ALL
           |  SELECT 'orders_totalprice_nonneg', CAST(min_tp AS DOUBLE), min_tp >= 0 FROM o
           |  UNION ALL
           |  SELECT 'lineitem_qty_range', CAST(in_rng AS DOUBLE) / CAST(n AS DOUBLE), in_rng = n FROM l
           |  UNION ALL
           |  SELECT 'lineitem_fk_orders', CAST(v AS DOUBLE), v = 0 FROM fk)
           |ORDER BY check_name""".stripMargin)
  )

  /** Q104 — winsorization (quantile clipping): clamp each event value
    * into its event-type's [p05, p95] band, the standard outlier
    * treatment before feature scaling (q75 *flags* outliers; this
    * *repairs* them). Quantiles are exact order statistics — the value
    * at rank ceil(p·n) — so there is NO interpolation arithmetic to
    * drift between engines; clipping is pure comparison on raw
    * doubles.
    *
    * Scale shape: one rank window per event-type partition feeding a
    * 2-row-per-group bounds table that broadcasts back over the
    * stream. The full per-group sort is the exact-quantile cost — at
    * 100 TB swap the bounds source for q91's mergeable GK sketch (the
    * clipping join is unchanged); declared trade-off.
    */
  val q104 = Query(
    "q104_winsorize",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("event_type"), col("value"))
      val w = Window.partitionBy("event_type").orderBy("value")
      val counts = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
      val bounds = ev.withColumn("rn", row_number().over(w))
        .join(broadcast(counts), "event_type")
        .withColumn("lo_rk", ceil(col("n") * lit(0.05)).cast("long"))
        .withColumn("hi_rk", ceil(col("n") * lit(0.95)).cast("long"))
        .filter(col("rn") === col("lo_rk") || col("rn") === col("hi_rk"))
        .groupBy("event_type")
        .agg(min(when(col("rn") === col("lo_rk"), col("value"))).as("lo"),
          min(when(col("rn") === col("hi_rk"), col("value"))).as("hi"))
      ev.join(broadcast(bounds), "event_type")
        .select(col("event_id"), col("event_type"), col("value"),
          least(greatest(col("value"), col("lo")), col("hi")).as("clipped"),
          (col("value") < col("lo") || col("value") > col("hi")).as("was_clipped"))
        .orderBy("event_id")
    },
    Some("""WITH ev AS (
           |  SELECT event_id, event_type, value FROM events),
           |ranked AS (
           |  SELECT event_type, value,
           |         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
           |         COUNT(*) OVER (PARTITION BY event_type) AS n
           |  FROM ev),
           |bounds AS (
           |  SELECT event_type,
           |         MIN(CASE WHEN rn = CAST(ceil(n * 0.05) AS BIGINT) THEN value END) AS lo,
           |         MIN(CASE WHEN rn = CAST(ceil(n * 0.95) AS BIGINT) THEN value END) AS hi
           |  FROM ranked
           |  WHERE rn = CAST(ceil(n * 0.05) AS BIGINT) OR rn = CAST(ceil(n * 0.95) AS BIGINT)
           |  GROUP BY event_type)
           |SELECT event_id, ev.event_type, value,
           |       least(greatest(value, lo), hi) AS clipped,
           |       (value < lo OR value > hi) AS was_clipped
           |FROM ev JOIN bounds USING (event_type)
           |ORDER BY event_id""".stripMargin)
  )

  /** Q105 — k-anonymity audit with one generalization step (the
    * privacy gate next to q73's PII scrub: q73 redacts direct
    * identifiers, this bounds re-identification via QUASI-identifiers):
    * customers grouped by (nation, market segment); any group smaller
    * than k=5 is generalized — its segment suppressed to '*' and the
    * remainder re-grouped per nation. Output = the anonymized release
    * groups with their level (0 = exact, 1 = generalized) and a final
    * is_k_anon verdict (a level-1 group can still be < k; a real
    * pipeline would iterate up the lattice — one step declared here).
    *
    * Scale shape: two combinable aggregates over the quasi-identifier
    * keys — group cardinality work, independent of row width; no
    * joins against the base table at all.
    */
  val q105 = Query(
    "q105_k_anonymity",
    (s, dir) => {
      val k = 5
      val l0 = Tables.customer(s, dir)
        .groupBy(col("c_nationkey").cast("long").as("nation"),
          col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n"))
      val ok = l0.filter(col("n") >= k)
        .select(col("nation"), col("segment"), col("n"), lit(0L).as("level"))
      val l1 = l0.filter(col("n") < k)
        .groupBy("nation")
        .agg(sum(col("n")).as("n"))
        .select(col("nation"), lit("*").as("segment"), col("n"),
          lit(1L).as("level"))
      ok.unionByName(l1)
        .withColumn("is_k_anon", col("n") >= k)
        .orderBy("nation", "segment")
    },
    Some("""WITH l0 AS (
           |  SELECT CAST(c_nationkey AS BIGINT) AS nation, c_mktsegment AS segment,
           |         COUNT(*) AS n
           |  FROM customer GROUP BY 1, 2),
           |ok AS (
           |  SELECT nation, segment, n, CAST(0 AS BIGINT) AS level
           |  FROM l0 WHERE n >= 5),
           |l1 AS (
           |  SELECT nation, '*' AS segment, CAST(SUM(n) AS BIGINT) AS n,
           |         CAST(1 AS BIGINT) AS level
           |  FROM l0 WHERE n < 5 GROUP BY nation)
           |SELECT nation, segment, n, level, n >= 5 AS is_k_anon
           |FROM (SELECT * FROM ok UNION ALL SELECT * FROM l1)
           |ORDER BY nation, segment""".stripMargin)
  )

  /** Q108 — RFM segmentation (recency / frequency / monetary), the
    * classic retail customer scoring for exactly the "Electronica"
    * domain the reference models: per customer the latest order date,
    * order count, and exact decimal spend, each quartile-scored with
    * `ntile(4)` (ties broken by custkey so both engines see one total
    * order). Customers without orders are out of scope by definition.
    *
    * Scale shape: one combinable aggregate keyed o_custkey + three
    * ntile windows over the same customer-grain relation (cardinality
    * = customers, far below fact grain). The unpartitioned ntile is
    * the honest exact-quartile cost — a single-partition sort of the
    * customer table; at extreme customer counts the scores would come
    * from broadcast quantile thresholds instead (the q91 GK sketch +
    * the q104 clipping-join shape). No joins back to the fact.
    */
  val q108 = Query(
    "q108_rfm",
    (s, dir) => {
      val base = Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate")).as("r_date"),
          count(lit(1)).as("f"),
          Canon.outD(sum(Canon.dec(col("o_totalprice")))).as("m"))
      val wR = Window.orderBy(col("r_date").desc, col("o_custkey").asc)
      val wF = Window.orderBy(col("f").desc, col("o_custkey").asc)
      val wM = Window.orderBy(col("m").desc, col("o_custkey").asc)
      base
        .withColumn("r_score", ntile(4).over(wR).cast("long"))
        .withColumn("f_score", ntile(4).over(wF).cast("long"))
        .withColumn("m_score", ntile(4).over(wM).cast("long"))
        .withColumn("rfm",
          concat(col("r_score"), col("f_score"), col("m_score")))
        .orderBy("o_custkey")
    },
    Some("""WITH base AS (
           |  SELECT o_custkey, MAX(o_orderdate) AS r_date, COUNT(*) AS f,
           |         CAST(CAST(round(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 4)
           |              AS DECIMAL(18,4)) AS DOUBLE) AS m
           |  FROM orders GROUP BY o_custkey)
           |SELECT o_custkey, r_date, f, m,
           |       CAST(ntile(4) OVER (ORDER BY r_date DESC, o_custkey ASC) AS BIGINT) AS r_score,
           |       CAST(ntile(4) OVER (ORDER BY f DESC, o_custkey ASC) AS BIGINT) AS f_score,
           |       CAST(ntile(4) OVER (ORDER BY m DESC, o_custkey ASC) AS BIGINT) AS m_score,
           |       concat(ntile(4) OVER (ORDER BY r_date DESC, o_custkey ASC),
           |              ntile(4) OVER (ORDER BY f DESC, o_custkey ASC),
           |              ntile(4) OVER (ORDER BY m DESC, o_custkey ASC)) AS rfm
           |FROM base ORDER BY o_custkey""".stripMargin)
  )

  /** Q109 — market-basket co-occurrence: the top-50 part pairs most
    * often ordered together ("customers who bought X also bought Y" —
    * the shopping-behavior analysis the reference's README promises,
    * over its own fact grain). Pair support counts come from a
    * within-order self-join; per-order pair fan-out is quadratic in
    * basket size, which TPC-H bounds at 7 lines — the same bounded-
    * fan-out argument as the shingle windows. One (orderkey) equi-join
    * + one (pair) combinable aggregate; no global quadratics.
    */
  val q109 = Query(
    "q109_basket_pairs",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val pairs = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("part_a"),
          col("b.l_partkey").as("part_b"))
        .agg(count(lit(1)).as("support"))
      // top-50 via TakeOrderedAndProject, rank over the 50 survivors —
      // the pair relation is huge at scale; never window-sort it whole
      graft.plans.TopKOps.rankedTopK(pairs,
          Seq(col("support").desc, col("part_a").asc, col("part_b").asc), 50)
        .orderBy("rank")
    },
    Some("""WITH li AS (
           |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
           |pairs AS (
           |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           |         COUNT(*) AS support
           |  FROM li a JOIN li b
           |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           |  GROUP BY 1, 2)
           |SELECT part_a, part_b, support,
           |       CAST(row_number() OVER (ORDER BY support DESC, part_a ASC, part_b ASC)
           |            AS BIGINT) AS rank
           |FROM pairs
           |QUALIFY row_number() OVER (ORDER BY support DESC, part_a ASC, part_b ASC) <= 50
           |ORDER BY rank""".stripMargin)
  )

  /** Q180 — frequent basket TRIPLES by Apriori candidate pruning, the
    * level-3 step q109's pair mining stops short of: report every part
    * triple co-ordered in ≥ 2 baskets. The Spark plan runs the real
    * Apriori cascade — items below min-support leave first, the triple
    * enumeration then grows only from SURVIVING pairs ((a,b) must be a
    * frequent pair before any c joins) and candidates are checked
    * against the frequent-pair set on the (y,z) and (x,z) edges too —
    * the full downward-closure check — because at
    * 100 TB the naive three-way self-join's fan-out is the whole cost,
    * and downward closure (a frequent triple's sub-pairs are frequent)
    * is what bounds it. The oracle states the UNPRUNED semantics (raw
    * three-way join, filter support ≥ 2), so the hash match proves the
    * pruning cascade lossless — q137's prefix-filter proof pattern.
    */
  val q180 = Query(
    "q180_basket_triples",
    (s, dir) => {
      val minSup = 2L
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val freqItems = li.groupBy("l_partkey")
        .agg(count(lit(1)).as("isup")).filter(col("isup") >= minSup)
        .select("l_partkey")
      val liF = li.join(freqItems, "l_partkey")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      // the (order, a, b) pair rows feed BOTH the level-2 support count
      // and the level-3 enumeration — materialize them once
      val pairRows = liF.as("a").join(liF.as("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .select(col("a.o").as("o"), col("a.p").as("x"), col("b.p").as("y"))
        .localCheckpoint()
      val freqPairs = pairRows
        .groupBy(col("x").as("fa"), col("y").as("fb"))
        .agg(count(lit(1)).as("psup")).filter(col("psup") >= minSup)
        .select("fa", "fb")
      val ab = pairRows
        .join(freqPairs,
          col("x") === col("fa") && col("y") === col("fb"))
        .select("o", "x", "y")
      val fp2 = freqPairs.select(col("fa").as("ga"), col("fb").as("gb"))
      ab.join(liF.as("c"), ab("o") === col("c.o") && col("y") < col("c.p"))
        .select(ab("o"), col("x"), col("y"), col("c.p").as("z"))
        .join(freqPairs,
          col("y") === col("fa") && col("z") === col("fb"))
        .join(fp2, col("x") === col("ga") && col("z") === col("gb"))
        .groupBy("x", "y", "z")
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= minSup)
        .orderBy(col("support").desc, col("x"), col("y"), col("z"))
    },
    Some("""WITH li AS (
           |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
           |t AS (
           |  SELECT a.l_partkey AS x, b.l_partkey AS y, c.l_partkey AS z,
           |         COUNT(*) AS support
           |  FROM li a
           |  JOIN li b ON a.l_orderkey = b.l_orderkey
           |           AND a.l_partkey < b.l_partkey
           |  JOIN li c ON a.l_orderkey = c.l_orderkey
           |           AND b.l_partkey < c.l_partkey
           |  GROUP BY 1, 2, 3)
           |SELECT x, y, z, support FROM t WHERE support >= 2
           |ORDER BY support DESC, x, y, z""".stripMargin)
  )

  /** Q181 — temporal cross-sell pairs: part A in a STRICTLY EARLIER
    * order than part B of the same customer, supported by the number
    * of distinct customers showing the sequence — the time-ordered
    * association q109/q180's within-basket co-occurrence cannot see
    * ("bought X, later came back for Y" is a recommendation signal;
    * "bought X and Y together" is a bundling one). Top-50 by support
    * with full key tiebreaks.
    *
    * Scale shape — the interval reduction: "some A-order strictly
    * before some B-order" ⟺ `min_date(A) < max_date(B)` per customer,
    * so each (customer, part) collapses to its [first, last] order
    * dates BEFORE the join (one combinable aggregate), the self-join
    * fans out over distinct parts² instead of (orders × parts)², and
    * support becomes a plain row count — each (customer, A, B) exists
    * at most once — with no COUNT(DISTINCT) shuffle at all. The oracle
    * states the naive order-pair semantics, proving the reduction
    * lossless. Hot customers remain the salting candidates
    * ([[SkewOps]]).
    */
  val q181 = Query(
    "q181_crosssell_seq",
    (s, dir) => {
      val spans = Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey").as("cust"), col("l_partkey").as("p"))
        .agg(min(col("o_orderdate")).as("first_d"),
          max(col("o_orderdate")).as("last_d"))
      val pairs = spans.as("a").join(spans.as("b"),
          col("a.cust") === col("b.cust") &&
            col("a.first_d") < col("b.last_d") &&
            col("a.p") =!= col("b.p"))
        .groupBy(col("a.p").as("part_a"), col("b.p").as("part_b"))
        .agg(count(lit(1)).as("support"))
      // top-50 via TakeOrderedAndProject + bounded rank (the q109 fix)
      graft.plans.TopKOps.rankedTopK(pairs,
          Seq(col("support").desc, col("part_a").asc, col("part_b").asc), 50)
        .orderBy("rank")
    },
    Some("""WITH ol AS (
           |  SELECT DISTINCT o.o_custkey AS cust, o.o_orderdate AS d,
           |         l.l_partkey AS p
           |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
           |seq AS (
           |  SELECT a.p AS part_a, b.p AS part_b,
           |         CAST(COUNT(DISTINCT a.cust) AS BIGINT) AS support
           |  FROM ol a JOIN ol b
           |    ON a.cust = b.cust AND a.d < b.d AND a.p <> b.p
           |  GROUP BY 1, 2)
           |SELECT part_a, part_b, support,
           |       CAST(row_number() OVER (
           |         ORDER BY support DESC, part_a ASC, part_b ASC) AS BIGINT)
           |         AS rank
           |FROM seq
           |QUALIFY row_number() OVER (
           |  ORDER BY support DESC, part_a ASC, part_b ASC) <= 50
           |ORDER BY rank""".stripMargin)
  )

  /** Q111 — population-stability drift detection (PSI): compare the
    * event-value distribution of the corpus's FIRST epoch week (the
    * "training" window) against everything after it (the "serving"
    * window) over 10 equal-width bins fitted on the reference window,
    * with add-one smoothing so empty bins stay finite. PSI > 0.2 per
    * bin-sum is the standard retrain alarm; this emits the per-bin
    * decomposition ((q−p)·ln(q/p)) an ML-ops dashboard plots.
    *
    * Cross-engine exactness: bin edges and the smoothed fractions are
    * exact integer/double arithmetic; `ln(q/p)` is rounded to 6
    * decimals (the q53 libm rule) and the final product is emitted as
    * raw IEEE arithmetic — identical AST both engines, no re-rounding.
    *
    * Scale shape: one min/max aggregate on the reference window
    * (broadcast scalars), then a single combinable (window, bin)
    * count — two scans, no joins wider than a broadcast of 4 numbers.
    */
  val q111 = Query(
    "q111_drift_psi",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select((expr("ts div 1000000000") / 604800L).cast("long").as("wk"),
          col("value"))
      val w0 = ev.agg(min(col("wk")).as("wk0"))
      val tagged = ev.crossJoin(broadcast(w0))
        .withColumn("is_ref", col("wk") === col("wk0"))
      val edges = tagged.filter(col("is_ref"))
        .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
      val binned = tagged.crossJoin(broadcast(edges))
        .withColumn("bin",
          least(lit(9L), greatest(lit(0L),
            floor((col("value") - col("lo")) / (col("hi") - col("lo")) * 10)
              .cast("long"))))
        .groupBy("bin")
        .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref"),
          sum(when(!col("is_ref"), 1L).otherwise(0L)).as("n_cur"))
      val totals = binned.agg(sum(col("n_ref")).as("t_ref"),
        sum(col("n_cur")).as("t_cur"))
      binned.crossJoin(broadcast(totals))
        .withColumn("p",
          (col("n_ref") + 1).cast("double") / (col("t_ref") + 10).cast("double"))
        .withColumn("q",
          (col("n_cur") + 1).cast("double") / (col("t_cur") + 10).cast("double"))
        .withColumn("contrib",
          (col("q") - col("p")) * round(log(col("q") / col("p")), 6))
        .select("bin", "n_ref", "n_cur", "p", "q", "contrib")
        .orderBy("bin")
    },
    Some("""WITH ev AS (
           |  SELECT CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 604800 AS wk,
           |         value
           |  FROM events),
           |w0 AS (SELECT MIN(wk) AS wk0 FROM ev),
           |tagged AS (SELECT value, wk = wk0 AS is_ref FROM ev, w0),
           |edges AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM tagged WHERE is_ref),
           |binned AS (
           |  SELECT least(9, greatest(0,
           |           CAST(floor((value - lo) / (hi - lo) * 10) AS BIGINT))) AS bin,
           |         SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS n_ref,
           |         SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS n_cur
           |  FROM tagged, edges GROUP BY 1),
           |totals AS (SELECT SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur FROM binned)
           |SELECT bin, CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
           |       CAST(n_ref + 1 AS DOUBLE) / CAST(t_ref + 10 AS DOUBLE) AS p,
           |       CAST(n_cur + 1 AS DOUBLE) / CAST(t_cur + 10 AS DOUBLE) AS q,
           |       (CAST(n_cur + 1 AS DOUBLE) / CAST(t_cur + 10 AS DOUBLE)
           |        - CAST(n_ref + 1 AS DOUBLE) / CAST(t_ref + 10 AS DOUBLE))
           |       * round(ln((CAST(n_cur + 1 AS DOUBLE) / CAST(t_cur + 10 AS DOUBLE))
           |                  / (CAST(n_ref + 1 AS DOUBLE) / CAST(t_ref + 10 AS DOUBLE))), 6)
           |         AS contrib
           |FROM binned, totals ORDER BY bin""".stripMargin)
  )

  /** Q114 — two-proportion A/B test: users split by id parity (the
    * deterministic assignment an experiment platform would persist),
    * conversion = q99's stage-2 rule (a click within one hour of the
    * first view — "ever purchased" saturates at 100% on this fixture
    * and a degenerate pooled rate voids the test: p(1−p)=0); emits
    * per-arm rates and the pooled two-proportion z statistic. Every
    * input is an exact integer count; the z arithmetic (one sqrt,
    * IEEE-correctly-rounded) is evaluated with the same AST in both
    * engines, so even the test statistic hash-checks — no
    * "approximately significant" fudge.
    *
    * Scale shape: one distinct-user aggregate + the two keyed
    * conditional-min aggregates of the conversion rule, all
    * co-partitioned on user_id; the z row is a constant-sized
    * reduction.
    */
  val q114 = Query(
    "q114_ab_test",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"),
          expr("ts div 1000000000").as("es"))
      val users = ev.select(col("user_id")).distinct()
        .withColumn("arm", pmod(col("user_id"), lit(2)).cast("long"))
      val t1 = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("es")).as("t1"))
      val converted = ev.filter(col("event_type") === "click")
        .join(t1, "user_id")
        .filter(col("es") > col("t1") && col("es") <= col("t1") + 3600L)
        .select("user_id").distinct().withColumn("conv", lit(1L))
      val arms = users.join(converted, Seq("user_id"), "left")
        .groupBy("arm")
        .agg(count(lit(1)).as("n"),
          sum(coalesce(col("conv"), lit(0L))).as("x"))
        .withColumn("rate", col("x").cast("double") / col("n").cast("double"))
      val z = arms.groupBy()
        .agg(
          sum(when(col("arm") === 0, col("x"))).as("x0"),
          sum(when(col("arm") === 0, col("n"))).as("n0"),
          sum(when(col("arm") === 1, col("x"))).as("x1"),
          sum(when(col("arm") === 1, col("n"))).as("n1"))
        .withColumn("p0", col("x0").cast("double") / col("n0").cast("double"))
        .withColumn("p1", col("x1").cast("double") / col("n1").cast("double"))
        .withColumn("pp",
          (col("x0") + col("x1")).cast("double") /
            (col("n0") + col("n1")).cast("double"))
        .withColumn("z",
          (col("p0") - col("p1")) /
            sqrt(col("pp") * (lit(1.0) - col("pp")) *
              (lit(1.0) / col("n0").cast("double") +
                lit(1.0) / col("n1").cast("double"))))
        .select(lit(-1L).as("arm"), (col("n0") + col("n1")).as("n"),
          (col("x0") + col("x1")).as("x"), col("z").as("rate"))
      arms.select(col("arm"), col("n"), col("x"), col("rate"))
        .unionByName(z)
        .orderBy("arm")
    },
    Some("""WITH ev AS (
           |  SELECT user_id, event_type,
           |         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es
           |  FROM events),
           |users AS (
           |  SELECT DISTINCT user_id, CAST(user_id % 2 AS BIGINT) AS arm FROM ev),
           |t1 AS (SELECT user_id, MIN(es) AS t1 FROM ev
           |       WHERE event_type = 'view' GROUP BY user_id),
           |conv AS (
           |  SELECT DISTINCT e.user_id, 1 AS conv
           |  FROM ev e JOIN t1 USING (user_id)
           |  WHERE event_type = 'click' AND es > t1 AND es <= t1 + 3600),
           |arms AS (
           |  SELECT arm, COUNT(*) AS n, CAST(SUM(COALESCE(conv, 0)) AS BIGINT) AS x,
           |         CAST(SUM(COALESCE(conv, 0)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS rate
           |  FROM users LEFT JOIN conv USING (user_id) GROUP BY arm),
           |zrow AS (
           |  SELECT CAST(-1 AS BIGINT) AS arm,
           |         CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS x,
           |         (MAX(CASE WHEN arm = 0 THEN CAST(x AS DOUBLE) / CAST(n AS DOUBLE) END)
           |          - MAX(CASE WHEN arm = 1 THEN CAST(x AS DOUBLE) / CAST(n AS DOUBLE) END))
           |         / sqrt((CAST(SUM(x) AS DOUBLE) / CAST(SUM(n) AS DOUBLE))
           |                * (1.0 - CAST(SUM(x) AS DOUBLE) / CAST(SUM(n) AS DOUBLE))
           |                * (1.0 / MAX(CASE WHEN arm = 0 THEN CAST(n AS DOUBLE) END)
           |                   + 1.0 / MAX(CASE WHEN arm = 1 THEN CAST(n AS DOUBLE) END)))
           |           AS rate
           |  FROM arms)
           |SELECT arm, n, x, rate FROM arms
           |UNION ALL SELECT arm, n, x, rate FROM zrow
           |ORDER BY arm""".stripMargin)
  )

  /** Q115 — spend-concentration (Gini coefficient over customer
    * lifetime spend, with the Lorenz-curve deciles): the inequality
    * lens on the same base as q108's RFM. Spend is summed in exact
    * decimal; ranks are integers; the Gini closed form
    * 2·Σ(i·xᵢ)/(n·Σxᵢ) − (n+1)/n divides two exact decimal-derived
    * doubles once at the end (same AST both engines). Emitted per
    * spend decile: customer share, cumulative spend share, and the
    * constant corpus Gini — the table a fairness/concentration
    * dashboard plots.
    *
    * Scale shape: customer-grain aggregate + one rank window over it
    * (the q108 trade-off note applies) + a decile rollup.
    */
  val q115 = Query(
    "q115_gini",
    (s, dir) => {
      val spend = Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(sum(Canon.dec(col("o_totalprice"))).as("m_dec"))
      val w = Window.orderBy(col("m_dec").asc, col("o_custkey").asc)
      val ranked = spend
        .withColumn("i", row_number().over(w).cast("long"))
        .withColumn("m", Canon.outD(col("m_dec")))
      val tot = ranked.groupBy()
        .agg(count(lit(1)).as("n"),
          Canon.outD(sum(col("m_dec"))).as("t"),
          // rank-weighted sum clamps to scale 0: at (18,4) its unscaled
          // value would pass 2^53 and the decimal->double conversion
          // could differ between engines (the Canon.outD rationale)
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
    Some("""WITH spend AS (
           |  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS m_dec
           |  FROM orders GROUP BY o_custkey),
           |ranked AS (
           |  SELECT o_custkey, m_dec,
           |         CAST(row_number() OVER (ORDER BY m_dec ASC, o_custkey ASC) AS BIGINT) AS i
           |  FROM spend),
           |tot AS (
           |  SELECT COUNT(*) AS n,
           |         CAST(CAST(round(SUM(m_dec), 4) AS DECIMAL(18,4)) AS DOUBLE) AS t,
           |         CAST(CAST(round(SUM(m_dec * i), 0) AS DECIMAL(18,0)) AS DOUBLE) AS wt
           |  FROM ranked),
           |g AS (
           |  SELECT n, t,
           |         2.0 * wt / (CAST(n AS DOUBLE) * t)
           |           - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE) AS gini
           |  FROM tot)
           |SELECT least(9, CAST(floor(CAST((i - 1) * 10 AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT)) AS decile,
           |       COUNT(*) AS n_cust,
           |       CAST(CAST(round(SUM(m_dec), 4) AS DECIMAL(18,4)) AS DOUBLE) AS spend,
           |       CAST(CAST(round(SUM(m_dec), 4) AS DECIMAL(18,4)) AS DOUBLE) / MAX(t) AS spend_share,
           |       MAX(gini) AS gini
           |FROM ranked, g
           |GROUP BY 1 ORDER BY decile""".stripMargin)
  )

  /** Q118 — per-nation revenue trend via closed-form OLS: regress
    * yearly order revenue on the year index and emit slope + intercept
    * — the "is this market growing?" readout next to q111's drift and
    * q117's changepoint. DuckDB's `regr_slope` is deliberately NOT
    * used: its internal accumulation is floating-point and
    * order-dependent; here every moment (n, Σx, Σx², Σy, Σxy) is an
    * exact integer/decimal sum, so the fit itself hash-checks.
    *
    * Cross-engine exactness: x = year − min(year) keeps Σxy small
    * enough that every decimal stays under 2^53 unscaled at (18,4)
    * (uncentred years at sf0.1 would cross it); slope = one IEEE
    * division of two exact-decimal-derived doubles; intercept reuses
    * the slope double with the identical AST in both engines.
    *
    * Scale shape: fact-side shuffle join orders↔customer on custkey
    * (co-partitioned at scale), broadcast nation + broadcast min-year
    * scalar, then a (nation, year) combinable aggregate whose output
    * is bounded by nations × horizon — the second aggregate is tiny.
    */
  val q118 = Query(
    "q118_trend_ols",
    (s, dir) => {
      val y0 = Tables.orders(s, dir)
        .agg(min(year(col("o_orderdate")).cast("long")).as("y0"))
      val yearly = Tables.orders(s, dir)
        .join(Tables.customer(s, dir).select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir).select("n_nationkey", "n_name")),
          col("c_nationkey") === col("n_nationkey"))
        .crossJoin(broadcast(y0))
        .groupBy(col("n_name"),
          (year(col("o_orderdate")).cast("long") - col("y0")).as("x"))
        .agg(sum(Canon.dec(col("o_totalprice"))).cast("decimal(18,4)").as("y"))
      yearly.groupBy("n_name")
        .agg(count(lit(1)).as("n_years"),
          sum(col("x")).as("sx"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y")).cast("decimal(18,4)").as("sy"),
          sum(col("y") * col("x")).cast("decimal(18,4)").as("sxy"))
        .filter(col("n_years") >= 2)
        .withColumn("num",
          (col("n_years") * col("sxy") - col("sx") * col("sy"))
            .cast("decimal(18,4)").cast("double"))
        .withColumn("den",
          (col("n_years") * col("sxx") - col("sx") * col("sx")).cast("double"))
        .withColumn("sum_rev", col("sy").cast("double"))
        .withColumn("slope", col("num") / col("den"))
        .withColumn("intercept",
          (col("sum_rev") - col("slope") * col("sx").cast("double"))
            / col("n_years").cast("double"))
        .select("n_name", "n_years", "sum_rev", "slope", "intercept")
        .orderBy("n_name")
    },
    Some("""WITH y0 AS (
           |  SELECT MIN(CAST(year(o_orderdate) AS BIGINT)) AS y0 FROM orders),
           |yearly AS (
           |  SELECT n.n_name,
           |         CAST(year(o.o_orderdate) AS BIGINT) - y0.y0 AS x,
           |         CAST(round(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))), 4)
           |              AS DECIMAL(18,4)) AS y
           |  FROM orders o
           |  JOIN customer c ON o.o_custkey = c.c_custkey
           |  JOIN nation n ON c.c_nationkey = n.n_nationkey, y0
           |  GROUP BY 1, 2),
           |sums AS (
           |  SELECT n_name, COUNT(*) AS n_years,
           |         CAST(SUM(x) AS BIGINT) AS sx,
           |         CAST(SUM(x * x) AS BIGINT) AS sxx,
           |         CAST(round(SUM(y), 4) AS DECIMAL(18,4)) AS sy,
           |         CAST(round(SUM(y * x), 4) AS DECIMAL(18,4)) AS sxy
           |  FROM yearly GROUP BY 1 HAVING COUNT(*) >= 2),
           |fit AS (
           |  SELECT n_name, n_years, sx, sy,
           |         CAST(CAST(round(n_years * sxy - sx * sy, 4) AS DECIMAL(18,4))
           |              AS DOUBLE) AS num,
           |         CAST(n_years * sxx - sx * sx AS DOUBLE) AS den
           |  FROM sums)
           |SELECT n_name, n_years, CAST(sy AS DOUBLE) AS sum_rev,
           |       num / den AS slope,
           |       (CAST(sy AS DOUBLE) - (num / den) * CAST(sx AS DOUBLE))
           |         / CAST(n_years AS DOUBLE) AS intercept
           |FROM fit ORDER BY n_name""".stripMargin)
  )

  /** Q120 — column profiler over the document corpus: for each profiled
    * column, row/null/distinct counts, the modal value, and the Shannon
    * entropy of the value distribution — the data-quality summary every
    * ingestion pipeline materializes before training (a lang column
    * collapsing to one value, or an entropy spike in `source`, is a
    * feed bug caught here).
    *
    * Cross-engine exactness — **fixed-point entropy** (the q103
    * integer-PageRank trick applied to −Σp·ln p): per value,
    * L(c) = round(ln(c)·10⁶) as BIGINT micro-nats (one libm ln + one
    * multiply + one round, identical in both engines; ln(c) ≥ 0 so
    * HALF_UP and half-away-from-zero agree), then
    * S = Σ c·L(c) is an exact order-free integer sum and
    * entropy = (n·L(n) − S) / (n·10⁶) with exactly two IEEE boundary
    * ops. A double Σp·ln p would be summation-order-dependent across
    * engines; this is not. Headroom: c·L(c) < 2⁶³ up to ~10¹¹ rows;
    * beyond that drop the scale to 10⁵.
    *
    * Scale shape: one `stack` pass over the corpus (no per-column
    * rescans), a combinable (column, value) count, then bounded
    * per-column rollups; the mode window partitions by column over the
    * already-aggregated frequency table.
    */
  val q120 = Query(
    "q120_profile",
    (s, dir) => {
      val stacked = Tables.documents(s, dir)
        .select(expr("stack(3, 'lang', CAST(lang AS STRING), " +
          "'source', CAST(source AS STRING), " +
          "'n_chars', CAST(n_chars AS STRING)) AS (col_name, val)"))
        .filter(col("val").isNotNull)
      val freq = stacked.groupBy("col_name", "val")
        .agg(count(lit(1)).as("c"))
        .withColumn("lc",
          round(log(col("c").cast("double")) * lit(1e6), 0).cast("long"))
      val aggd = freq.groupBy("col_name")
        .agg(sum(col("c")).as("n_vals"),
          count(lit(1)).as("n_distinct"),
          sum(col("c") * col("lc")).as("s_fp"))
      val w = Window.partitionBy("col_name")
        .orderBy(col("c").desc, col("val").asc)
      val mode = freq.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("col_name"), col("val").as("mode"), col("c").as("n_mode"))
      val tot = Tables.documents(s, dir).agg(count(lit(1)).as("n_total"))
      aggd.join(mode, "col_name").crossJoin(broadcast(tot))
        .withColumn("n_nulls", col("n_total") - col("n_vals"))
        .withColumn("entropy",
          (col("n_vals") *
            round(log(col("n_vals").cast("double")) * lit(1e6), 0).cast("long")
            - col("s_fp")).cast("double")
            / (col("n_vals").cast("double") * lit(1e6)))
        .select("col_name", "n_vals", "n_nulls", "n_distinct",
          "mode", "n_mode", "entropy")
        .orderBy("col_name")
    },
    Some("""WITH stacked AS (
           |  SELECT col_name, val FROM (
           |    SELECT CAST(lang AS VARCHAR) AS lang,
           |           CAST(source AS VARCHAR) AS source,
           |           CAST(n_chars AS VARCHAR) AS n_chars
           |    FROM documents)
           |  UNPIVOT (val FOR col_name IN (lang, source, n_chars))
           |  WHERE val IS NOT NULL),
           |freq AS (
           |  SELECT col_name, val, COUNT(*) AS c,
           |         CAST(round(ln(CAST(COUNT(*) AS DOUBLE)) * 1e6) AS BIGINT) AS lc
           |  FROM stacked GROUP BY 1, 2),
           |aggd AS (
           |  SELECT col_name, CAST(SUM(c) AS BIGINT) AS n_vals,
           |         COUNT(*) AS n_distinct,
           |         CAST(SUM(c * lc) AS BIGINT) AS s_fp
           |  FROM freq GROUP BY 1),
           |md AS (
           |  SELECT col_name, val AS mode, c AS n_mode
           |  FROM freq
           |  QUALIFY row_number() OVER (PARTITION BY col_name
           |                             ORDER BY c DESC, val ASC) = 1),
           |tot AS (SELECT COUNT(*) AS n_total FROM documents)
           |SELECT a.col_name, a.n_vals, t.n_total - a.n_vals AS n_nulls,
           |       a.n_distinct, m.mode, m.n_mode,
           |       CAST(a.n_vals
           |              * CAST(round(ln(CAST(a.n_vals AS DOUBLE)) * 1e6) AS BIGINT)
           |            - a.s_fp AS DOUBLE)
           |         / (CAST(a.n_vals AS DOUBLE) * 1e6) AS entropy
           |FROM aggd a JOIN md m USING (col_name), tot t
           |ORDER BY col_name""".stripMargin)
  )

  /** Q123 — Benford's-law audit over order totals: the
    * first-significant-digit distribution vs the log₁₀(1+1/d)
    * expectation — the forensic-accounting screen for fabricated or
    * truncated monetary data (a feed that clamps or synthesizes prices
    * shows up as a digit-1 deficit long before any mean shifts).
    *
    * Cross-engine exactness: the digit comes from the CENTS integer
    * (round(x·100) → BIGINT → first character of the integer's decimal
    * rendering — integer-to-string is identical across engines,
    * double-to-string is NOT, and floor(x/10^floor(log10 x)) is
    * boundary-fragile at powers of ten). The Benford expectation is
    * log₁₀ under the q53 6dp libm rule; freq and deviation are raw
    * single-op IEEE arithmetic with identical ASTs.
    *
    * Scale shape: one map-side digit extraction + a 9-bucket
    * combinable count; the total is a broadcast scalar.
    */
  val q123 = Query(
    "q123_benford",
    (s, dir) => {
      val digits = Tables.orders(s, dir)
        .select(substring(
          round(col("o_totalprice") * 100).cast("long").cast("string"), 1, 1)
          .cast("long").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n"))
      val tot = digits.agg(sum(col("n")).as("n_total"))
      digits.crossJoin(broadcast(tot))
        .withColumn("freq", col("n").cast("double") / col("n_total").cast("double"))
        .withColumn("expected",
          round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")), 6))
        .withColumn("dev", col("freq") - col("expected"))
        .select("digit", "n", "freq", "expected", "dev")
        .orderBy("digit")
    },
    Some("""WITH digits AS (
           |  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
           |                     AS VARCHAR), 1, 1) AS BIGINT) AS digit,
           |         COUNT(*) AS n
           |  FROM orders GROUP BY 1),
           |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM digits)
           |SELECT digit, n,
           |       CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE) AS freq,
           |       round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS expected,
           |       CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE)
           |         - round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS dev
           |FROM digits, tot ORDER BY digit""".stripMargin)
  )

  /** Q124 — skyline (Pareto frontier) over customers maximizing
    * (best single-order value, order count): the "best under multiple criteria
    * with no weighting" operator (top suppliers by cost AND lead time,
    * model configs by quality AND latency). A point survives iff no
    * other point is ≥ in both dimensions and > in one.
    *
    * Algorithm — sort-based 2D skyline, NOT the naive all-pairs
    * dominance join: collapse to the max order-count per distinct
    * spend, take a running max over strictly-greater spends (one
    * ordered window over the DISTINCT-spend relation, which is tiny
    * after the groupBy), and a point survives iff it beats that
    * running max and matches its own spend-group max. O(n log n) vs
    * the quadratic self-join; the DuckDB oracle IS the quadratic
    * NOT-EXISTS dominance definition, so the hash-check proves the
    * window formulation equals the textbook semantics on a different
    * algorithm entirely.
    *
    * Cross-engine exactness: spend through exact decimal (the window
    * orders by the decimal, not the double); counts integral; outD at
    * the boundary.
    */
  val q124 = Query(
    "q124_skyline",
    (s, dir) => {
      val pts = Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(max(Canon.dec(col("o_totalprice"))).as("spend_dec"),
          count(lit(1)).as("n_orders"))
      val perS = pts.groupBy("spend_dec").agg(max(col("n_orders")).as("g"))
      val w = Window.orderBy(col("spend_dec").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val withPrev = perS.withColumn("prevmax", max(col("g")).over(w))
      pts.join(withPrev, "spend_dec")
        .filter((col("prevmax").isNull || col("prevmax") < col("n_orders")) &&
          col("n_orders") === col("g"))
        .select(col("o_custkey"), Canon.outD(col("spend_dec")).as("best_order"),
          col("n_orders"))
        .orderBy("o_custkey")
    },
    Some("""WITH pts AS (
           |  SELECT o_custkey,
           |         MAX(CAST(o_totalprice AS DECIMAL(18,4))) AS spend_dec,
           |         COUNT(*) AS n_orders
           |  FROM orders GROUP BY 1)
           |SELECT p.o_custkey, CAST(p.spend_dec AS DOUBLE) AS best_order, p.n_orders
           |FROM pts p
           |WHERE NOT EXISTS (
           |  SELECT 1 FROM pts q
           |  WHERE q.spend_dec >= p.spend_dec AND q.n_orders >= p.n_orders
           |    AND (q.spend_dec > p.spend_dec OR q.n_orders > p.n_orders))
           |ORDER BY p.o_custkey""".stripMargin)
  )

  /** Q129 — mutual information between two categorical columns
    * (lang × source): the per-cell lift table plus the corpus MI in
    * nats — the dependence screen that catches a scraper feeding one
    * language from one source (high MI) before any per-column profile
    * (q120) shifts. Per-cell lift > 1 marks over-represented
    * combinations; MI aggregates the whole table into one number.
    *
    * Cross-engine exactness: lift = (c·n)/(r·s) with both products
    * exact BIGINTs (< 2⁶³ comfortably at any tested SF; at extreme
    * row counts compute the ratio as (c/r)·(n/s) in doubles) and one
    * IEEE division; ln(lift) in fixed-point micro-nats (q120's rule —
    * negative logs round half-away-from-zero identically in both
    * engines), so MI = Σc·L / (n·10⁶) is an exact-integer-derived
    * quotient.
    *
    * Scale shape: one (lang, source) combinable count; margins are
    * two tiny rollups of it, broadcast back; no shuffle wider than
    * the cell count.
    */
  val q129 = Query(
    "q129_mutual_info",
    (s, dir) => {
      val cells = Tables.documents(s, dir)
        .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n"))
      val rMarg = cells.groupBy("lang").agg(sum(col("n")).as("r"))
      val cMarg = cells.groupBy("source").agg(sum(col("n")).as("c"))
      val tot = cells.agg(sum(col("n")).as("nt"))
      val lifted = cells
        .join(broadcast(rMarg), "lang")
        .join(broadcast(cMarg), "source")
        .crossJoin(broadcast(tot))
        .withColumn("lift",
          (col("n") * col("nt")).cast("double") /
            (col("r") * col("c")).cast("double"))
        .withColumn("l_fp",
          round(log(col("lift")) * lit(1e6), 0).cast("long"))
      val mi = lifted
        .agg((sum(col("n") * col("l_fp")).cast("double") /
          (max(col("nt")).cast("double") * lit(1e6))).as("mi"))
      lifted.crossJoin(broadcast(mi))
        .select(col("lang"), col("source"), col("n"), col("lift"), col("mi"))
        .orderBy("lang", "source")
    },
    Some("""WITH cells AS (
           |  SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY 1, 2),
           |rm AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS r FROM cells GROUP BY 1),
           |cm AS (SELECT source, CAST(SUM(n) AS BIGINT) AS c FROM cells GROUP BY 1),
           |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM cells),
           |lifted AS (
           |  SELECT cells.lang, cells.source, cells.n,
           |         CAST(cells.n * tot.nt AS DOUBLE)
           |           / CAST(rm.r * cm.c AS DOUBLE) AS lift,
           |         CAST(round(ln(CAST(cells.n * tot.nt AS DOUBLE)
           |                       / CAST(rm.r * cm.c AS DOUBLE)) * 1e6)
           |              AS BIGINT) AS l_fp
           |  FROM cells JOIN rm USING (lang) JOIN cm USING (source), tot),
           |mi AS (
           |  SELECT CAST(SUM(n * l_fp) AS DOUBLE)
           |           / (CAST(MAX(nt) AS DOUBLE) * 1e6) AS mi
           |  FROM lifted, tot)
           |SELECT lang, source, n, lift, mi
           |FROM lifted, mi ORDER BY lang, source""".stripMargin)
  )

  /** Q131 — ROC-AUC of `value` as a one-vs-rest classifier score for
    * each event type, by the exact Mann–Whitney rank-sum identity:
    * AUC = (Σ_pos 2·r̄ − n₊(n₊+1)) / (2·n₊·n₋) with r̄ the mid-rank
    * (average rank over ties). The model-eval primitive every
    * quality-classifier loop needs — run at corpus scale without
    * materializing a single sorted score stream.
    *
    * Cross-engine exactness: every term is exact BIGINT arithmetic —
    * mid-ranks come from the value histogram (2·r̄ = 2·cum_less +
    * tie_count + 1 is always an integer), so the only FP op is the
    * final division of two exact integers (< 2⁵³ at tested SFs; at
    * extreme N carry the two sums as DECIMAL(38,0)).
    *
    * Scale shape: the ordered running sum runs over the DISTINCT
    * value histogram (a 2dp grid, ≤ ~49 k cells — bounded model-ish
    * state), not the event stream: this is the classic
    * histogram-binned AUC. Everything event-sized is a combinable
    * groupBy; the single-partition window touches only the compact
    * histogram.
    */
  val q131 = Query(
    "q131_auc",
    (s, dir) => {
      val ev = Tables.events(s, dir).select(col("event_type"), col("value"))
      val dist = ev.groupBy("value").agg(count(lit(1)).as("c"))
      val cum = dist.withColumn("cum",
        coalesce(sum(col("c")).over(
          Window.orderBy("value").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      val byType = ev.groupBy("value", "event_type").agg(count(lit(1)).as("p"))
      val tot = ev.agg(count(lit(1)).as("n_total"))
      byType.join(cum, "value")
        .groupBy("event_type")
        .agg(sum(col("p")).as("n_pos"),
          sum(col("p") * (lit(2L) * col("cum") + col("c") + lit(1L))).as("rank2"))
        .crossJoin(broadcast(tot))
        .withColumn("n_neg", col("n_total") - col("n_pos"))
        .withColumn("auc",
          (col("rank2") - col("n_pos") * (col("n_pos") + lit(1L))).cast("double") /
            (lit(2L) * col("n_pos") * col("n_neg")).cast("double"))
        .select("event_type", "n_pos", "n_neg", "auc")
        .orderBy("event_type")
    },
    Some("""WITH ev AS (SELECT event_type, value FROM events),
           |dist AS (SELECT value, COUNT(*) AS c FROM ev GROUP BY 1),
           |cum AS (
           |  SELECT value, c,
           |         COALESCE(SUM(c) OVER (ORDER BY value
           |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
           |  FROM dist),
           |bt AS (SELECT value, event_type, COUNT(*) AS p FROM ev GROUP BY 1, 2),
           |tot AS (SELECT COUNT(*) AS n_total FROM ev),
           |agg AS (
           |  SELECT event_type, CAST(SUM(p) AS BIGINT) AS n_pos,
           |         CAST(SUM(p * (2 * cum + c + 1)) AS BIGINT) AS rank2
           |  FROM bt JOIN cum USING (value) GROUP BY 1)
           |SELECT event_type, n_pos,
           |       CAST(n_total - n_pos AS BIGINT) AS n_neg,
           |       CAST(rank2 - n_pos * (n_pos + 1) AS DOUBLE)
           |         / CAST(2 * n_pos * (n_total - n_pos) AS DOUBLE) AS auc
           |FROM agg, tot ORDER BY event_type""".stripMargin)
  )

  /** Q135 — calibration readout for a score used as a classifier: bin
    * `value` (normalized by its max) into 10 equal-width bins, compare
    * each bin's mean score ("confidence") to its empirical
    * purchase rate ("accuracy"), and summarize with Expected
    * Calibration Error. The companion to q131: AUC grades ranking,
    * ECE grades the probabilities themselves.
    *
    * Cross-engine exactness: scores ride as exact integer cents
    * (`value` is a 2-decimal grid; round(value*100) is exact), so the
    * ECE telescopes: Σ_b n_b·|acc_b − conf_b|/N =
    * Σ_b |pos_b·maxc − cents_b| / (maxc·N) — an exact-BIGINT numerator
    * and ONE IEEE division; conf and acc are each one division too.
    *
    * Scale shape: equal-width binning (not rank deciles) keeps the
    * bin assignment map-side — `floor(cents·10/maxc)` after one scalar
    * broadcast — so the whole readout is a single combinable
    * 10-group aggregate. A rank-based ntile would force a global sort.
    * At extreme N carry the cents sums as DECIMAL(38,0).
    */
  val q135 = Query(
    "q135_calibration",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(round(col("value") * 100, 0).cast("long").as("cents"),
          (col("event_type") === "purchase").cast("long").as("pos"))
      val m = broadcast(ev.agg(max("cents").as("maxc")))
      val bins = ev.crossJoin(m)
        .withColumn("bin", least(expr("cents * 10 div maxc"), lit(9L)))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"), sum("pos").as("n_pos"),
          sum("cents").as("sum_cents"), max("maxc").as("maxc"))
        .withColumn("conf", col("sum_cents").cast("double") /
          (col("n") * col("maxc")).cast("double"))
        .withColumn("acc",
          col("n_pos").cast("double") / col("n").cast("double"))
        .withColumn("dev_num",
          abs(col("n_pos") * col("maxc") - col("sum_cents")))
      val ece = broadcast(bins.agg(
        (sum("dev_num").cast("double") /
          (max("maxc") * sum("n")).cast("double")).as("ece")))
      bins.crossJoin(ece)
        .select("bin", "n", "n_pos", "conf", "acc", "ece")
        .orderBy("bin")
    },
    Some("""WITH ev AS (
           |  SELECT CAST(round(value * 100, 0) AS BIGINT) AS cents,
           |         CAST(event_type = 'purchase' AS BIGINT) AS pos
           |  FROM events),
           |m AS (SELECT MAX(cents) AS maxc FROM ev),
           |b AS (
           |  SELECT LEAST(cents * 10 // maxc, 9) AS bin, COUNT(*) AS n,
           |         CAST(SUM(pos) AS BIGINT) AS n_pos,
           |         CAST(SUM(cents) AS BIGINT) AS sum_cents, MAX(maxc) AS maxc
           |  FROM ev, m GROUP BY 1),
           |e AS (
           |  SELECT CAST(SUM(ABS(n_pos * maxc - sum_cents)) AS DOUBLE) /
           |         CAST(MAX(maxc) * SUM(n) AS DOUBLE) AS ece
           |  FROM b)
           |SELECT bin, n, n_pos,
           |       CAST(sum_cents AS DOUBLE) / CAST(n * maxc AS DOUBLE) AS conf,
           |       CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS acc, e.ece
           |FROM b, e ORDER BY bin""".stripMargin)
  )

  /** Q136 — chi-squared test of lang × source independence on the
    * document corpus, with Cramér's V effect size. The significance
    * companion to q129's mutual information: MI measures how much the
    * association carries, chi²/V measure whether and how strongly it
    * deviates from independence.
    *
    * Cross-engine exactness: chi² = Σ_cells (N·o − r·c)²/(N·r·c) —
    * every numerator and denominator is an exact BIGINT from
    * confusion-cell counts (at extreme N move them to DECIMAL(38,0)),
    * each term is one IEEE division rounded once to 6 decimals, and
    * the terms sum as DECIMAL(18,6) (order-free). Cramér's V adds one
    * division and one sqrt — both correctly-rounded IEEE ops.
    *
    * Scale shape: one (lang, source) combinable count, broadcast
    * margins, and a ≤ |langs|·|sources|-cell reduction — nothing
    * event-sized past the first aggregate.
    */
  val q136 = Query(
    "q136_chi2",
    (s, dir) => {
      val cells = Tables.documents(s, dir)
        .groupBy("lang", "source").agg(count(lit(1)).as("o"))
      val rm = cells.groupBy("lang").agg(sum("o").as("r"))
      val cm = cells.groupBy("source").agg(sum("o").as("c"))
      val tot = cells.agg(sum("o").as("n_docs"),
        countDistinct("lang").as("nl"), countDistinct("source").as("ns"))
      cells.join(broadcast(rm), "lang").join(broadcast(cm), "source")
        .crossJoin(broadcast(tot))
        .withColumn("num", col("n_docs") * col("o") - col("r") * col("c"))
        .withColumn("term", round((col("num") * col("num")).cast("double") /
          (col("n_docs") * col("r") * col("c")).cast("double"), 6)
          .cast("decimal(18,6)"))
        .agg(max("n_docs").as("n_docs"),
          ((max("nl") - 1) * (max("ns") - 1)).as("dof"),
          sum("term").cast("decimal(18,6)").cast("double").as("chi2"),
          least(max("nl") - 1, max("ns") - 1).as("mindim"))
        .withColumn("cramers_v", sqrt(col("chi2") /
          (col("n_docs") * col("mindim")).cast("double")))
        .select("n_docs", "dof", "chi2", "cramers_v")
    },
    Some("""WITH cells AS (
           |  SELECT lang, source, COUNT(*) AS o FROM documents GROUP BY 1, 2),
           |rm AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY 1),
           |cm AS (SELECT source, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1),
           |tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n_docs,
           |               COUNT(DISTINCT lang) AS nl,
           |               COUNT(DISTINCT source) AS ns
           |        FROM cells),
           |terms AS (
           |  SELECT n_docs, nl, ns,
           |         CAST(round(
           |           CAST((n_docs*o - r*c) * (n_docs*o - r*c) AS DOUBLE) /
           |           CAST(n_docs * r * c AS DOUBLE), 6) AS DECIMAL(18,6)) AS term
           |  FROM cells JOIN rm USING (lang) JOIN cm USING (source)
           |  CROSS JOIN tot),
           |agg AS (
           |  SELECT MAX(n_docs) AS n_docs,
           |         CAST((MAX(nl)-1) * (MAX(ns)-1) AS BIGINT) AS dof,
           |         CAST(CAST(SUM(term) AS DECIMAL(18,6)) AS DOUBLE) AS chi2,
           |         LEAST(MAX(nl)-1, MAX(ns)-1) AS mindim
           |  FROM terms)
           |SELECT n_docs, dof, chi2,
           |       sqrt(chi2 / CAST(n_docs * mindim AS DOUBLE)) AS cramers_v
           |FROM agg""".stripMargin)
  )

  /** Q139 — robust outlier screen per event type: exact median and
    * MAD (median absolute deviation) by the q39 rank device, and the
    * count of rows beyond 3 MADs. The robust companion to q75's
    * mean/σ z-score: one corrupted heavy tail moves mean and σ but
    * not the medians, which is why data-quality monitors prefer this
    * form.
    *
    * Cross-engine exactness: values ride as exact integer cents, both
    * medians are rank-selected cents (no interpolation, no FP
    * compare), the 3-MAD cut is the integer predicate
    * dev > 3·mad_c (the 1.4826 normal-consistency constant is left
    * out deliberately — it would put an FP product on a comparison
    * boundary), and the two output doubles are single divisions by
    * 100.
    *
    * Scale shape: two rank passes keyed on event_type (median, then
    * deviation median) with the per-type medians broadcast back — the
    * inherent two-job shape of exact MAD; each pass is one shuffle.
    */
  val q139 = Query(
    "q139_mad_outliers",
    (s, dir) => {
      val ev = Tables.events(s, dir).select(col("event_type"), col("event_id"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      val w1 = Window.partitionBy("event_type")
        .orderBy(col("cents").asc, col("event_id").asc)
      val wp = Window.partitionBy("event_type")
      val med = ev
        .withColumn("rn", row_number().over(w1))
        .withColumn("n", count(lit(1)).over(wp))
        .groupBy("event_type")
        .agg(max(when(col("rn") === ceil(col("n") * 0.5), col("cents")))
          .as("med_c"), count(lit(1)).as("n"))
      val dev = ev.join(broadcast(med), "event_type")
        .withColumn("dev", abs(col("cents") - col("med_c")))
      val w2 = Window.partitionBy("event_type")
        .orderBy(col("dev").asc, col("event_id").asc)
      val mad = dev
        .withColumn("rn", row_number().over(w2))
        .groupBy("event_type")
        .agg(max(when(col("rn") === ceil(col("n") * 0.5), col("dev")))
          .as("mad_c"))
      dev.join(broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(max("n").as("n"),
          (max("med_c").cast("double") / lit(100.0)).as("median"),
          (max("mad_c").cast("double") / lit(100.0)).as("mad"),
          count(when(col("dev") > lit(3L) * col("mad_c"), lit(1)))
            .as("n_outliers"))
        .orderBy("event_type")
    },
    Some("""WITH ev AS (
           |  SELECT event_type, event_id,
           |         CAST(round(value * 100, 0) AS BIGINT) AS cents
           |  FROM events),
           |r1 AS (
           |  SELECT event_type, cents,
           |         row_number() OVER (PARTITION BY event_type
           |                            ORDER BY cents, event_id) AS rn,
           |         COUNT(*) OVER (PARTITION BY event_type) AS n
           |  FROM ev),
           |med AS (
           |  SELECT event_type,
           |         MAX(CASE WHEN rn = ceil(n * 0.5) THEN cents END) AS med_c,
           |         COUNT(*) AS n
           |  FROM r1 GROUP BY 1),
           |d AS (
           |  SELECT e.event_type, e.event_id, m.med_c, m.n,
           |         abs(e.cents - m.med_c) AS dev
           |  FROM ev e JOIN med m USING (event_type)),
           |r2 AS (
           |  SELECT *, row_number() OVER (PARTITION BY event_type
           |                              ORDER BY dev, event_id) AS rn
           |  FROM d),
           |mad AS (
           |  SELECT event_type,
           |         MAX(CASE WHEN rn = ceil(n * 0.5) THEN dev END) AS mad_c
           |  FROM r2 GROUP BY 1)
           |SELECT d.event_type, CAST(MAX(d.n) AS BIGINT) AS n,
           |       CAST(MAX(d.med_c) AS DOUBLE) / 100.0 AS median,
           |       CAST(MAX(m.mad_c) AS DOUBLE) / 100.0 AS mad,
           |       COUNT(CASE WHEN d.dev > 3 * m.mad_c THEN 1 END) AS n_outliers
           |FROM d JOIN mad m USING (event_type)
           |GROUP BY 1 ORDER BY 1""".stripMargin)
  )

  /** Q141 — incremental rollup maintenance: the event log is split at
    * a cutover day into a "base" (yesterday's materialized rollup) and
    * a "delta" (today's arrivals), partial aggregates are computed per
    * side, and the MERGE of the partials is emitted. The oracle states
    * the direct single-pass aggregate over the whole log — the
    * hash-match is the algebraic-mergeability proof that makes
    * incremental ETL (and the streaming `foreachBatch` upsert path in
    * [[graft.streaming.StreamingPipeline]]) safe to run instead of
    * full recomputes at 100 TB.
    *
    * Every partial is a commutative monoid (count, sum over exact
    * cents, min, max); avg is recomposed from merged sum/count at the
    * output boundary — never averaged-of-averages. One IEEE division.
    */
  val q141 = Query(
    "q141_incremental_rollup",
    (s, dir) => {
      val ev = Tables.events(s, dir).select(col("event_type"),
        expr("ts div 1000000000 div 86400").as("day"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      val cut = broadcast(ev.agg((min("day") + lit(21L)).as("cutover")))
      val partials = ev.crossJoin(cut)
        .withColumn("part",
          when(col("day") < col("cutover"), lit("base")).otherwise(lit("delta")))
        .groupBy("event_type", "part")
        .agg(count(lit(1)).as("n"), sum("cents").as("sum_c"),
          min("cents").as("min_c"), max("cents").as("max_c"))
      partials.groupBy("event_type")
        .agg(sum("n").as("n"), sum("sum_c").as("sum_c"),
          min("min_c").as("min_c"), max("max_c").as("max_c"))
        .withColumn("avg_value", col("sum_c").cast("double") /
          (col("n") * lit(100L)).cast("double"))
        .orderBy("event_type")
    },
    Some("""WITH ev AS (
           |  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS cents
           |  FROM events)
           |SELECT event_type, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS sum_c,
           |       MIN(cents) AS min_c, MAX(cents) AS max_c,
           |       CAST(SUM(cents) AS DOUBLE)
           |         / CAST(COUNT(*) * 100 AS DOUBLE) AS avg_value
           |FROM ev GROUP BY 1 ORDER BY 1""".stripMargin)
  )

  /** Q142 — exact audience overlap: for every ordered pair of event
    * types, the distinct-user counts of each, of both, and their
    * Jaccard — the "did both X and Y" matrix every campaign-analytics
    * board shows, computed exactly (the sketch-based estimate is
    * q62's HLL territory).
    *
    * Scale design: one user-keyed `bit_or` collapses each user's
    * type set to ONE BIGINT bitmask (types get bits from a rank over
    * the tiny distinct-type relation, broadcast back), and the mask
    * histogram has ≤ 2^|types| rows — so the pairwise matrix is
    * arithmetic over a ~32-row table, never a user×user or
    * (user,type)×(user,type) self-join. At any corpus size the only
    * event-scale work is one combinable groupBy(user).
    *
    * Cross-engine exactness: pure integer bit arithmetic and counts;
    * jaccard is one IEEE division of exact BIGINTs.
    */
  val q142 = Query(
    "q142_audience_overlap",
    (s, dir) => {
      val types = Tables.events(s, dir).select("event_type").distinct()
        .withColumn("b",
          row_number().over(Window.orderBy("event_type")) - lit(1))
      val masks = Tables.events(s, dir).select("user_id", "event_type")
        .join(broadcast(types), "event_type")
        .groupBy("user_id")
        .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), b))").as("mask"))
        .groupBy("mask").agg(count(lit(1)).as("n"))
      val pairs = types.select(col("event_type").as("t_a"), col("b").as("ba"))
        .join(types.select(col("event_type").as("t_b"), col("b").as("bb")),
          col("t_a") < col("t_b"))
      pairs.crossJoin(broadcast(masks))
        .groupBy("t_a", "t_b")
        .agg(
          coalesce(sum(when(
            expr("(mask & shiftleft(CAST(1 AS BIGINT), ba)) != 0"),
            col("n"))), lit(0L)).as("n_a"),
          coalesce(sum(when(
            expr("(mask & shiftleft(CAST(1 AS BIGINT), bb)) != 0"),
            col("n"))), lit(0L)).as("n_b"),
          coalesce(sum(when(
            expr("(mask & shiftleft(CAST(1 AS BIGINT), ba)) != 0") &&
              expr("(mask & shiftleft(CAST(1 AS BIGINT), bb)) != 0"),
            col("n"))), lit(0L)).as("n_both"))
        .withColumn("jaccard", col("n_both").cast("double") /
          (col("n_a") + col("n_b") - col("n_both")).cast("double"))
        .orderBy("t_a", "t_b")
    },
    Some("""WITH t AS (
           |  SELECT event_type, row_number() OVER (ORDER BY event_type) - 1 AS b
           |  FROM (SELECT DISTINCT event_type FROM events)),
           |u AS (
           |  SELECT user_id, CAST(bit_or(1 << b) AS BIGINT) AS mask
           |  FROM events JOIN t USING (event_type) GROUP BY 1),
           |m AS (SELECT mask, COUNT(*) AS n FROM u GROUP BY 1),
           |p AS (
           |  SELECT a.event_type AS t_a, a.b AS ba, y.event_type AS t_b, y.b AS bb
           |  FROM t a JOIN t y ON a.event_type < y.event_type)
           |SELECT t_a, t_b,
           |       CAST(COALESCE(SUM(CASE WHEN (mask & (1 << ba)) <> 0
           |                              THEN n END), 0) AS BIGINT) AS n_a,
           |       CAST(COALESCE(SUM(CASE WHEN (mask & (1 << bb)) <> 0
           |                              THEN n END), 0) AS BIGINT) AS n_b,
           |       CAST(COALESCE(SUM(CASE WHEN (mask & (1 << ba)) <> 0
           |                               AND (mask & (1 << bb)) <> 0
           |                              THEN n END), 0) AS BIGINT) AS n_both,
           |       CAST(COALESCE(SUM(CASE WHEN (mask & (1 << ba)) <> 0
           |                               AND (mask & (1 << bb)) <> 0
           |                              THEN n END), 0) AS DOUBLE) /
           |       CAST(COALESCE(SUM(CASE WHEN (mask & (1 << ba)) <> 0
           |                              THEN n END), 0)
           |          + COALESCE(SUM(CASE WHEN (mask & (1 << bb)) <> 0
           |                              THEN n END), 0)
           |          - COALESCE(SUM(CASE WHEN (mask & (1 << ba)) <> 0
           |                               AND (mask & (1 << bb)) <> 0
           |                              THEN n END), 0) AS DOUBLE) AS jaccard
           |FROM p CROSS JOIN m
           |GROUP BY t_a, t_b, ba, bb
           |ORDER BY t_a, t_b""".stripMargin)
  )

  /** Q144 — correlated LATERAL top-n join: each customer's three most
    * expensive orders, written as `FROM customer, LATERAL (SELECT …
    * WHERE o_custkey = c_custkey ORDER BY … LIMIT 3)` — the per-row
    * subquery surface every warehouse dialect exposes and q16/q94's
    * DataFrame top-k cannot claim (SQL users write it this way).
    *
    * Scale note: Catalyst DECORRELATES the lateral subquery — the plan
    * is one equi-join plus a partitioned `row_number` filter, never a
    * per-customer subquery execution (AnalyticSpec asserts against
    * the plan: no `LateralJoin` survives optimization; at
    * 100 TB it is exactly the q16 window plan). The oracle runs the
    * very same SQL, where DuckDB executes its own lateral-unnest
    * strategy — two engines, two physical strategies, one result.
    *
    * Exactness: o_totalprice passes through untouched; ties broken by
    * o_orderkey so the LIMIT-3 set and the output order are total.
    */
  val q144 = Query(
    "q144_lateral_topn",
    (s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("lat_customer")
      Tables.orders(s, dir).createOrReplaceTempView("lat_orders")
      s.sql(
        """SELECT c_custkey, o_orderkey, o_totalprice
          |FROM lat_customer,
          |     LATERAL (SELECT o_orderkey, o_totalprice
          |              FROM lat_orders
          |              WHERE o_custkey = c_custkey
          |              ORDER BY o_totalprice DESC, o_orderkey
          |              LIMIT 3)
          |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin)
    },
    Some("""SELECT c_custkey, o_orderkey, o_totalprice
           |FROM customer,
           |     LATERAL (SELECT o_orderkey, o_totalprice
           |              FROM orders
           |              WHERE o_custkey = c_custkey
           |              ORDER BY o_totalprice DESC, o_orderkey
           |              LIMIT 3) o
           |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin)
  )

  /** Q148 — join fan-out audit: the distribution of lineitems per
    * order (including zero-match orders), as a histogram of fan-out →
    * order count. This is the profile you read BEFORE launching a
    * 100 TB join: the histogram's tail says whether the join explodes
    * (hot keys → q57 salting), its zero bucket quantifies referential
    * slack (q09/q96's FK audits count them; this sizes them), and
    * fan·|keys| upper-bounds the join output.
    *
    * Scale shape: the fact table is reduced to (key, count) by a
    * combinable aggregate BEFORE any join — the orders side then joins
    * a key-grain relation, never the raw fact; the histogram rollup
    * sees one row per order. All counts exact BIGINTs.
    */
  val q148 = Query(
    "q148_fanout_audit",
    (s, dir) => {
      val fanPerKey = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("fan"))
      Tables.orders(s, dir).select("o_orderkey")
        .join(fanPerKey, col("o_orderkey") === col("l_orderkey"), "left")
        .select(coalesce(col("fan"), lit(0L)).as("fanout"))
        .groupBy("fanout").agg(count(lit(1)).as("n_orders"))
        .orderBy("fanout")
    },
    Some("""WITH f AS (
           |  SELECT o_orderkey, COUNT(l_orderkey) AS fanout
           |  FROM orders LEFT JOIN lineitem ON l_orderkey = o_orderkey
           |  GROUP BY 1)
           |SELECT fanout, COUNT(*) AS n_orders
           |FROM f GROUP BY 1 ORDER BY fanout""".stripMargin)
  )

  /** Q149 — probability-proportional-to-size sampling: each document
    * is kept with probability `n_chars / max(n_chars)` — the sampler
    * behind token-budgeted training mixtures, where selecting DOCS
    * uniformly (q88/q89) under-represents long documents' tokens.
    * Complements q67's fixed-rate mixture with a size-aware rate.
    *
    * Determinism/exactness: inclusion is decided by integer cross-
    * multiplication of the q88 md5 residue against `n_chars·10^6` —
    * no division, no float, so membership is bit-stable across
    * engines, partitionings, and retries (the property that makes the
    * sample REPRODUCIBLE in an audit). The reported inclusion
    * probability is one output-boundary IEEE division.
    *
    * Scale shape: one scalar max broadcast against a map-side filter —
    * no shuffle at fact grain at all.
    */
  val q149 = Query(
    "q149_weighted_sample",
    (s, dir) => {
      val d = Tables.documents(s, dir).select("doc_id", "lang", "n_chars")
      val mx = d.agg(max("n_chars").as("maxc"))
      d.crossJoin(broadcast(mx))
        .filter(Canon.md5Residue(concat(lit("pps:"), col("doc_id")), 1000000L)
          * col("maxc") < col("n_chars") * lit(1000000L))
        .withColumn("p_incl",
          col("n_chars").cast("double") / col("maxc").cast("double"))
        .select("doc_id", "lang", "n_chars", "p_incl")
        .orderBy("doc_id")
    },
    Some("""WITH mx AS (SELECT MAX(n_chars) AS maxc FROM documents)
           |SELECT doc_id, lang, n_chars,
           |       CAST(n_chars AS DOUBLE) / CAST(maxc AS DOUBLE) AS p_incl
           |FROM documents CROSS JOIN mx
           |WHERE CAST(concat('0x', substr(md5(concat('pps:', doc_id)), 1, 15)) AS BIGINT)
           |        % 1000000 * maxc < n_chars * 1000000
           |ORDER BY doc_id""".stripMargin)
  )

  /** Q153 — two-sample Kolmogorov–Smirnov distance, one-vs-rest per
    * event type over the `value` distribution: the distribution-shift
    * test that answers "do purchases carry DIFFERENT values than
    * everything else?" where q131's AUC grades ranking and q111's PSI
    * needs binning — KS is the binless supremum over the empirical
    * CDFs, with its argmax value localizing WHERE the distributions
    * diverge.
    *
    * Exactness device: the supremum is maximized over exact BIGINT
    * cross-products — |cum_t·n_rest − cum_rest·n_t| — so the argmax
    * involves no float comparison at all (the q114/q146 rule); the KS
    * statistic itself is ONE final IEEE division. CDF jumps only at
    * observed values, so scanning the distinct-value grid is exact.
    *
    * Scale shape: the grid is the DISTINCT-value histogram (q131's
    * device) crossed with the ≤|types| type list, cumulated per type
    * in one bounded window. The global cum_all window runs over the
    * compact grid, never the event stream; at true 100 TB grids the
    * q91 GK sketch replaces the exact CDF (with a stated error bound),
    * exactly as it replaces q39's exact ranks.
    */
  val q153 = Query(
    "q153_ks_test",
    (s, dir) => {
      val ev = Tables.events(s, dir).select(col("event_type"), col("value"))
      val dist = ev.groupBy("value").agg(count(lit(1)).as("c"))
        .withColumn("cum_all", sum(col("c")).over(Window.orderBy("value")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val types = ev.groupBy("event_type").agg(count(lit(1)).as("n_pos"))
      val tot = ev.agg(count(lit(1)).as("n_total"))
      val bt = ev.groupBy("value", "event_type").agg(count(lit(1)).as("p"))
      val wt = Window.partitionBy("event_type").orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val scored = dist.crossJoin(broadcast(types))
        .join(bt, Seq("value", "event_type"), "left")
        .withColumn("p", coalesce(col("p"), lit(0L)))
        .withColumn("cum_t", sum(col("p")).over(wt))
        .crossJoin(broadcast(tot))
        .withColumn("ksn", abs(col("cum_t") * (col("n_total") - col("n_pos")) -
          (col("cum_all") - col("cum_t")) * col("n_pos")))
      val wr = Window.partitionBy("event_type")
        .orderBy(col("ksn").desc, col("value").asc)
      scored.withColumn("rk", row_number().over(wr)).filter(col("rk") === 1)
        .select(col("event_type"), col("n_pos"),
          (col("n_total") - col("n_pos")).as("n_rest"),
          col("ksn").as("ks_num"),
          (col("ksn").cast("double") /
            (col("n_pos") * (col("n_total") - col("n_pos"))).cast("double")).as("ks"),
          col("value").as("ks_at"))
        .orderBy("event_type")
    },
    Some("""WITH ev AS (SELECT event_type, value FROM events),
           |dist AS (
           |  SELECT value, CAST(COUNT(*) AS BIGINT) AS c FROM ev GROUP BY 1),
           |distc AS (
           |  SELECT value, c,
           |         CAST(SUM(c) OVER (ORDER BY value) AS BIGINT) AS cum_all
           |  FROM dist),
           |types AS (
           |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pos
           |  FROM ev GROUP BY 1),
           |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM ev),
           |bt AS (
           |  SELECT value, event_type, CAST(COUNT(*) AS BIGINT) AS p
           |  FROM ev GROUP BY 1, 2),
           |grid AS (
           |  SELECT d.value, d.c, d.cum_all, t.event_type, t.n_pos,
           |         COALESCE(b.p, 0) AS p
           |  FROM distc d CROSS JOIN types t
           |  LEFT JOIN bt b ON b.value = d.value AND b.event_type = t.event_type),
           |sc AS (
           |  SELECT *, CAST(SUM(p) OVER (PARTITION BY event_type ORDER BY value)
           |                 AS BIGINT) AS cum_t
           |  FROM grid),
           |num AS (
           |  SELECT event_type, n_pos, n_total, value,
           |         abs(cum_t * (n_total - n_pos)
           |             - (cum_all - cum_t) * n_pos) AS ksn
           |  FROM sc, tot)
           |SELECT event_type, n_pos, CAST(n_total - n_pos AS BIGINT) AS n_rest,
           |       CAST(ksn AS BIGINT) AS ks_num,
           |       CAST(ksn AS DOUBLE)
           |         / CAST(n_pos * (n_total - n_pos) AS DOUBLE) AS ks,
           |       value AS ks_at
           |FROM (SELECT *, row_number() OVER (PARTITION BY event_type
           |                  ORDER BY ksn DESC, value) AS rk FROM num)
           |WHERE rk = 1 ORDER BY event_type""".stripMargin)
  )

  /** Q156 — Poisson-bootstrap confidence interval for mean order value
    * per priority: the one bootstrap that works on data too large to
    * resample — instead of drawing B resamples, every row gets B
    * independent Poisson(1) weights (the large-N limit of multinomial
    * resampling), so the whole procedure is a ×B fan-out plus one
    * combinable weighted aggregation, no materialized resample and no
    * global shuffle beyond the group key. The CI is read off the order
    * statistics of the B=16 replicate means (2nd/15th ≈ central 87.5%),
    * avoiding any variance/sqrt arithmetic.
    *
    * Determinism device: the Poisson draw is inverse-CDF over the
    * md5-residue uniform ([[graft.Canon.md5Residue]] on (orderkey, b)),
    * with the CDF cutoffs pre-multiplied into integer literals — weight
    * assignment is pure BIGINT comparison, bit-stable across engines,
    * partitionings, and retries (the q42/q149 membership rule).
    * Replicate means are carried as EXACT half-up-rounded micro-units
    * (mean6 = (2·s·100 + n) div (2·n) on BIGINT sums of 1e-4 price
    * units) and ranked as integers — no double enters the ordering.
    * Every emitted double is a single IEEE division of two exact
    * integers < 2^53 (the q131 Mann–Whitney device); the round-2 red
    * row was the DECIMAL(18,4)→DOUBLE conversion hazard this removes.
    */
  val q156 = Query(
    "q156_bootstrap_ci",
    (s, dir) => {
      val B = 16
      // inverse-CDF cutoffs: floor(P(X<=j) * 1000000007) for Poisson(1)
      val (t0, t1, t2, t3) = (367879443L, 735758887L, 919698609L, 981011849L)
      val o = Tables.orders(s, dir)
        .select(col("o_orderpriority"), col("o_orderkey"),
          (graft.Canon.dec(col("o_totalprice")) * lit(10000))
            .cast("long").as("units"))
      val reps = o
        .withColumn("b", explode(sequence(lit(1), lit(B))))
        .withColumn("u", graft.Canon.md5Residue(
          concat(col("o_orderkey").cast("string"), lit(":"), col("b").cast("string")),
          1000000007L))
        .withColumn("w",
          when(col("u") < t0, 0L).when(col("u") < t1, 1L)
            .when(col("u") < t2, 2L).when(col("u") < t3, 3L).otherwise(4L))
        .groupBy(col("o_orderpriority"), col("b"))
        .agg(sum(col("w")).as("n_b"),
          sum(col("w") * col("units")).as("s_units"))
        // mean6 through a decimal(38,0) intermediate: 200·s_units in
        // BIGINT overflows around SF50-100 (where Spark would wrap
        // silently while DuckDB raises — cross-engine divergence at
        // exactly the scale this device exists for); decimal(38,0) here
        // / HUGEINT oracle-side buy ~1e19 more headroom, and `div`
        // still lands the quotient back in BIGINT
        .withColumn("mean6",
          expr("(2 * cast(s_units as decimal(38,0)) * 100 + n_b) div (2 * n_b)"))
      val wR = Window.partitionBy("o_orderpriority")
        .orderBy(col("mean6").asc, col("b").asc)
      val bands = reps.withColumn("rn", row_number().over(wR))
        .groupBy("o_orderpriority")
        .agg(max(when(col("rn") === 2, col("mean6"))).as("lo6"),
          max(when(col("rn") === B - 1, col("mean6"))).as("hi6"))
        .select(col("o_orderpriority"),
          (col("lo6").cast("double") / lit(1e6)).as("boot_lo"),
          (col("hi6").cast("double") / lit(1e6)).as("boot_hi"))
      val point = o.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"), sum(col("units")).as("sum_units"))
        .withColumn("point_mean",
          col("sum_units").cast("double") /
            (col("n_orders") * lit(10000L)).cast("double"))
      point.join(bands, "o_orderpriority")
        .select("o_orderpriority", "n_orders", "point_mean", "boot_lo", "boot_hi")
        .orderBy("o_orderpriority")
    },
    Some("""WITH o AS (
           |  SELECT o_orderpriority, o_orderkey,
           |         CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT) AS units
           |  FROM orders),
           |reps AS (
           |  SELECT o_orderpriority, b,
           |         CAST(SUM(w) AS BIGINT) AS n_b,
           |         CAST(SUM(w * units) AS BIGINT) AS s_units
           |  FROM (
           |    SELECT o_orderpriority, b,
           |           CASE WHEN u < 367879443 THEN 0
           |                WHEN u < 735758887 THEN 1
           |                WHEN u < 919698609 THEN 2
           |                WHEN u < 981011849 THEN 3 ELSE 4 END AS w,
           |           units
           |    FROM (
           |      SELECT o.*, b,
           |             CAST(concat('0x', substr(md5(concat(
           |               CAST(o_orderkey AS VARCHAR), ':', CAST(b AS VARCHAR))),
           |               1, 15)) AS BIGINT) % 1000000007 AS u
           |      FROM o, unnest(generate_series(1, 16)) AS t(b)))
           |  GROUP BY 1, 2),
           |means AS (
           |  SELECT o_orderpriority, b,
           |         (2 * CAST(s_units AS HUGEINT) * 100 + n_b) // (2 * n_b) AS mean6
           |  FROM reps),
           |bands AS (
           |  SELECT o_orderpriority,
           |         CAST(max(CASE WHEN rn = 2 THEN mean6 END) AS DOUBLE)
           |           / 1000000 AS boot_lo,
           |         CAST(max(CASE WHEN rn = 15 THEN mean6 END) AS DOUBLE)
           |           / 1000000 AS boot_hi
           |  FROM (SELECT *, row_number() OVER (PARTITION BY o_orderpriority
           |                    ORDER BY mean6, b) AS rn FROM means)
           |  GROUP BY 1),
           |pt AS (
           |  SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
           |         CAST(CAST(SUM(units) AS BIGINT) AS DOUBLE)
           |           / CAST(COUNT(*) * 10000 AS DOUBLE) AS point_mean
           |  FROM o GROUP BY 1)
           |SELECT pt.o_orderpriority, n_orders, point_mean, boot_lo, boot_hi
           |FROM pt JOIN bands USING (o_orderpriority)
           |ORDER BY o_orderpriority""".stripMargin)
  )

  /** Q159 — ratio-to-report: each (priority, status) cell's revenue as
    * a share of its priority subtotal and of the grand total, all from
    * ONE aggregation pass — the subtotals are unpartitioned/partitioned
    * window sums over the already-rolled-up cell grid, so the fact
    * table is scanned once and the percent-of-total arithmetic runs on
    * a ≤ |priorities|×|statuses| relation. Shares are exact-decimal
    * numerators over exact-decimal denominators, one IEEE division
    * each (the q11 device); the classic BI share-of-wallet shape that
    * q13's ROLLUP emits as separate subtotal ROWS, restated as columns.
    */
  val q159 = Query(
    "q159_ratio_report",
    (s, dir) => {
      val cells = Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(graft.Canon.dec(col("o_totalprice"))).as("rev"))
      val wP = Window.partitionBy("o_orderpriority")
      val wG = Window.partitionBy()
      cells
        .withColumn("rev_prio", sum(col("rev")).over(wP))
        .withColumn("rev_all", sum(col("rev")).over(wG))
        .select(col("o_orderpriority"), col("o_orderstatus"), col("n"),
          graft.Canon.outD(col("rev")).as("rev"),
          (col("rev").cast("decimal(18,4)").cast("double") /
            col("rev_prio").cast("decimal(18,4)").cast("double")).as("share_of_priority"),
          (col("rev").cast("decimal(18,4)").cast("double") /
            col("rev_all").cast("decimal(18,4)").cast("double")).as("share_of_total"))
        .orderBy("o_orderpriority", "o_orderstatus")
    },
    Some("""WITH cells AS (
           |  SELECT o_orderpriority, o_orderstatus,
           |         CAST(COUNT(*) AS BIGINT) AS n,
           |         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
           |  FROM orders GROUP BY 1, 2)
           |SELECT o_orderpriority, o_orderstatus, n,
           |       CAST(CAST(rev AS DECIMAL(18,4)) AS DOUBLE) AS rev,
           |       CAST(CAST(rev AS DECIMAL(18,4)) AS DOUBLE)
           |         / CAST(CAST(SUM(rev) OVER (PARTITION BY o_orderpriority)
           |                AS DECIMAL(18,4)) AS DOUBLE) AS share_of_priority,
           |       CAST(CAST(rev AS DECIMAL(18,4)) AS DOUBLE)
           |         / CAST(CAST(SUM(rev) OVER () AS DECIMAL(18,4)) AS DOUBLE)
           |         AS share_of_total
           |FROM cells
           |ORDER BY o_orderpriority, o_orderstatus""".stripMargin)
  )

  /** Q160 — period-over-period growth: monthly revenue with
    * month-over-month delta and year-over-year ratio on the
    * zero-filled month spine (q59's gap-fill device — a missing month
    * must read as 0, not silently shorten every lag). MoM is an exact
    * decimal difference; YoY is ONE division, null where the
    * denominator month is absent-or-zero. Months are integer indices
    * (year·12 + month) so lag(12) is calendar-exact with no date
    * arithmetic to drift. One month-grain rollup + one bounded lag
    * window — post-rollup data is KB at any scale.
    */
  val q160 = Query(
    "q160_pop_growth",
    (s, dir) => {
      val monthly = Tables.orders(s, dir)
        .select((year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("mi"),
          graft.Canon.dec(col("o_totalprice")).as("p"))
        .groupBy("mi").agg(sum(col("p")).as("rev"), count(lit(1)).as("n"))
      val bounds = monthly.agg(min(col("mi")).as("lo"), max(col("mi")).as("hi"))
      val spine = bounds.select(explode(sequence(col("lo"), col("hi"))).as("mi"))
      val dense = spine.join(monthly, Seq("mi"), "left")
        .select(col("mi"),
          coalesce(col("rev"), lit(0).cast("decimal(18,4)")).as("rev"),
          coalesce(col("n"), lit(0L)).as("n"))
      val w = Window.orderBy("mi")
      dense
        .withColumn("prev", lag(col("rev"), 1).over(w))
        .withColumn("yago", lag(col("rev"), 12).over(w))
        .select(
          expr("mi div 12").as("yr"),
          (col("mi") % 12L + 1L).as("mo"),
          col("n"),
          graft.Canon.outD(col("rev")).as("rev"),
          graft.Canon.outD(col("rev") - col("prev")).as("mom_delta"),
          when(col("yago").isNotNull && col("yago") =!= 0,
            col("rev").cast("decimal(18,4)").cast("double") /
              col("yago").cast("decimal(18,4)").cast("double")).as("yoy_ratio"))
        .orderBy("yr", "mo")
    },
    Some("""WITH monthly AS (
           |  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS mi,
           |         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev,
           |         CAST(COUNT(*) AS BIGINT) AS n
           |  FROM orders GROUP BY 1),
           |spine AS (
           |  SELECT unnest(generate_series(min(mi), max(mi))) AS mi FROM monthly),
           |dense AS (
           |  SELECT s.mi, COALESCE(m.rev, CAST(0 AS DECIMAL(18,4))) AS rev,
           |         COALESCE(m.n, 0) AS n
           |  FROM spine s LEFT JOIN monthly m USING (mi)),
           |lagged AS (
           |  SELECT mi, rev, n,
           |         lag(rev, 1) OVER (ORDER BY mi) AS prev,
           |         lag(rev, 12) OVER (ORDER BY mi) AS yago
           |  FROM dense)
           |SELECT CAST(mi // 12 AS BIGINT) AS yr,
           |       CAST(mi % 12 + 1 AS BIGINT) AS mo,
           |       CAST(n AS BIGINT) AS n,
           |       CAST(CAST(rev AS DECIMAL(18,4)) AS DOUBLE) AS rev,
           |       CAST(CAST(rev - prev AS DECIMAL(18,4)) AS DOUBLE) AS mom_delta,
           |       CASE WHEN yago IS NOT NULL AND yago <> 0
           |            THEN CAST(CAST(rev AS DECIMAL(18,4)) AS DOUBLE)
           |                 / CAST(CAST(yago AS DECIMAL(18,4)) AS DOUBLE) END AS yoy_ratio
           |FROM lagged ORDER BY yr, mo""".stripMargin)
  )

  /** Q161 — equi-DEPTH histogram of order values: 10 equal-frequency
    * bins, the complement of q49's equal-width bins (which starve on
    * skewed data: one hot bin, nine empty). Bin membership is the pure
    * integer expression `((rank−1)·10) div N` over the (value, key)
    * total order — no percentile arithmetic, no interpolation, and the
    * orderkey tiebreak makes duplicate values land deterministically.
    * Per bin: count (N/10 ± 1 by construction), exact value bounds,
    * exact decimal sum. The global rank window is the q39 exact-rank
    * device; at 100 TB the q91 GK sketch supplies the bin EDGES and
    * binning becomes a broadcast map-side lookup — same output
    * contract, stated error.
    */
  val q161 = Query(
    "q161_equidepth_hist",
    (s, dir) => {
      val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_totalprice"))
      val n = o.agg(count(lit(1)).as("n_total"))
      val w = Window.orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      o.withColumn("rn", row_number().over(w).cast("long"))
        .crossJoin(broadcast(n))
        .withColumn("bin", expr("((rn - 1) * 10) div n_total"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"),
          graft.Canon.dsum(col("o_totalprice")).as("rev"))
        .orderBy("bin")
    },
    Some("""WITH o AS (SELECT o_orderkey, o_totalprice FROM orders),
           |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM o),
           |ranked AS (
           |  SELECT o_totalprice,
           |         CAST(row_number() OVER (ORDER BY o_totalprice, o_orderkey)
           |              AS BIGINT) AS rn
           |  FROM o)
           |SELECT ((rn - 1) * 10) // n_total AS bin,
           |       CAST(COUNT(*) AS BIGINT) AS n,
           |       min(o_totalprice) AS lo, max(o_totalprice) AS hi,
           |       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
           |            AS DECIMAL(18,4)) AS DOUBLE) AS rev
           |FROM ranked, n GROUP BY 1 ORDER BY bin""".stripMargin)
  )

  /** Q166 — per-type Tukey box-plot stats over event values: exact
    * order-statistic quartiles on integer cents (q135's grid), IQR,
    * and the count outside the 1.5·IQR fences — the robust screening
    * summary between q75's parametric z-score and q139's MAD. Every
    * number is an exact BIGINT: quartiles are values AT ranks
    * ceil(n·p/100) (declared semantics, no interpolation), fences are
    * integer arithmetic with the ×2 cross-multiplication so 1.5·IQR
    * never touches a float. Per-group rank windows are the q39 exact
    * device; q91's GK sketch replaces them at 100 TB.
    */
  val q166 = Query(
    "q166_boxplot_stats",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_type"), col("event_id"),
          round(col("value") * 100, 0).cast("long").as("c"))
      val w = Window.partitionBy("event_type")
        .orderBy(col("c").asc, col("event_id").asc)
      val ranked = ev.withColumn("rn", row_number().over(w).cast("long"))
      val withN = ranked
        .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
        .withColumn("i25", expr("(n * 25 + 99) div 100"))
        .withColumn("i50", expr("(n * 50 + 99) div 100"))
        .withColumn("i75", expr("(n * 75 + 99) div 100"))
      val qs = withN.groupBy("event_type")
        .agg(max(col("n")).as("n"),
          min(col("c")).as("min_c"), max(col("c")).as("max_c"),
          max(when(col("rn") === col("i25"), col("c"))).as("p25_c"),
          max(when(col("rn") === col("i50"), col("c"))).as("p50_c"),
          max(when(col("rn") === col("i75"), col("c"))).as("p75_c"))
        .withColumn("iqr_c", col("p75_c") - col("p25_c"))
      val outliers = ev.join(broadcast(qs.select(col("event_type"),
          col("p25_c").as("q1"), col("p75_c").as("q3"))), "event_type")
        .filter(col("c") * 2 < col("q1") * 2 - (col("q3") - col("q1")) * 3 ||
          col("c") * 2 > col("q3") * 2 + (col("q3") - col("q1")) * 3)
        .groupBy("event_type").agg(count(lit(1)).as("n_outliers"))
      qs.join(outliers, Seq("event_type"), "left")
        .select(col("event_type"), col("n"), col("min_c"), col("p25_c"),
          col("p50_c"), col("p75_c"), col("max_c"), col("iqr_c"),
          coalesce(col("n_outliers"), lit(0L)).as("n_outliers"))
        .orderBy("event_type")
    },
    Some("""WITH ev AS (
           |  SELECT event_type, event_id,
           |         CAST(round(value * 100, 0) AS BIGINT) AS c
           |  FROM events),
           |ranked AS (
           |  SELECT event_type, c,
           |         CAST(row_number() OVER (PARTITION BY event_type
           |              ORDER BY c, event_id) AS BIGINT) AS rn,
           |         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
           |  FROM ev),
           |qs AS (
           |  SELECT event_type, max(n) AS n, min(c) AS min_c, max(c) AS max_c,
           |         max(CASE WHEN rn = (n * 25 + 99) // 100 THEN c END) AS p25_c,
           |         max(CASE WHEN rn = (n * 50 + 99) // 100 THEN c END) AS p50_c,
           |         max(CASE WHEN rn = (n * 75 + 99) // 100 THEN c END) AS p75_c
           |  FROM ranked GROUP BY event_type),
           |outl AS (
           |  SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n_outliers
           |  FROM ev e JOIN qs q ON e.event_type = q.event_type
           |  WHERE e.c * 2 < q.p25_c * 2 - (q.p75_c - q.p25_c) * 3
           |     OR e.c * 2 > q.p75_c * 2 + (q.p75_c - q.p25_c) * 3
           |  GROUP BY 1)
           |SELECT q.event_type, q.n, q.min_c, q.p25_c, q.p50_c, q.p75_c,
           |       q.max_c, CAST(q.p75_c - q.p25_c AS BIGINT) AS iqr_c,
           |       COALESCE(o.n_outliers, 0) AS n_outliers
           |FROM qs q LEFT JOIN outl o ON q.event_type = o.event_type
           |ORDER BY q.event_type""".stripMargin)
  )

  /** Q190 — exact distinct counting via chunked BITMAPS (the
    * roaring-bitmap pattern Druid/ClickHouse use): daily distinct
    * active users computed as bit_or-merged 64-bit chunk masks + one
    * popcount sum — never a COUNT(DISTINCT) over the event grain. Each
    * event sets bit (user mod 64) in chunk (user div 64); level 1 is a
    * map-side-combinable bit_or per (day, chunk) — at most ⌈users/64⌉
    * rows per day survive the shuffle regardless of event volume —
    * and level 2 sums popcounts per day. The masks form a monoid
    * (bit_or is associative/commutative/idempotent), so the rollup is
    * incrementally mergeable like q62's HLL but EXACT; the trade is
    * memory proportional to the id space (why HLL still wins for
    * ~unbounded domains, and why real systems compress the chunks —
    * roaring — to get both).
    *
    * The oracle is the plain `COUNT(DISTINCT user_id)` — the hash
    * match PROVES the bitmap device exact (q57's salting-proof
    * pattern). Shift/popcount semantics agree across engines:
    * `1::BIGINT << 63` is the same two's-complement bit pattern in
    * both, and bit_count counts pattern bits regardless of sign.
    */
  val q190 = Query(
    "q190_bitmap_distinct",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(expr("ts div 1000000000 div 86400").as("day"), col("user_id"))
      ev.groupBy(col("day"), expr("user_id div 64").as("chunk"))
        .agg(count(lit(1)).as("n_events"),
          expr("bit_or(shiftleft(1L, cast(user_id % 64 as int)))").as("mask"))
        .groupBy("day")
        .agg(sum(col("n_events")).as("n_events"),
          sum(bit_count(col("mask")).cast("long")).as("n_users"))
        .orderBy("day")
    },
    Some("""SELECT CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400 AS day,
           |       COUNT(*) AS n_events,
           |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
           |FROM events GROUP BY 1 ORDER BY day""".stripMargin)
  )

  /** Q197 — GROUPING SETS with explicit grouping bits: the
    * (priority × status) cell grid, both one-dimension rollups, and the
    * grand total in ONE aggregation pass — the generalized form of
    * q13's ROLLUP that BI layers emit for cross-tab totals. The
    * grouping level is computed as `grouping(a)·2 + grouping(b)`
    * EXPLICITLY rather than via `grouping_id()` so both engines state
    * the identical bit order (standard SQL GROUPING, 1 = aggregated
    * away). Scale shape: Spark expands the sets map-side and feeds one
    * combinable HashAggregate — no per-set re-scan.
    */
  val q197 = Query(
    "q197_grouping_sets",
    (s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("gs_orders")
      s.sql("""SELECT o_orderpriority, o_orderstatus,
              |       CAST(grouping(o_orderpriority) * 2 +
              |            grouping(o_orderstatus) AS BIGINT) AS lvl,
              |       COUNT(*) AS n,
              |       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
              |            AS DECIMAL(18,4)) AS DOUBLE) AS rev
              |FROM gs_orders
              |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
              |                        (o_orderpriority), (o_orderstatus), ())
              |ORDER BY lvl, o_orderpriority, o_orderstatus""".stripMargin)
    },
    Some("""SELECT o_orderpriority, o_orderstatus,
           |       CAST(grouping(o_orderpriority) * 2 +
           |            grouping(o_orderstatus) AS BIGINT) AS lvl,
           |       CAST(COUNT(*) AS BIGINT) AS n,
           |       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
           |            AS DECIMAL(18,4)) AS DOUBLE) AS rev
           |FROM orders
           |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
           |                        (o_orderpriority), (o_orderstatus), ())
           |ORDER BY lvl, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin)
  )

  /** Q198 — LATERAL per-group top-k (each nation's 3 highest-balance
    * customers), stated as the correlated subquery a SQL user writes.
    * The point is what Catalyst DOES with it: DecorrelateInnerQuery
    * rewrites the per-nation ORDER BY … LIMIT into a window
    * PARTITIONED BY the correlation key — the exact scale-correct plan
    * [[graft.plans.TopKOps.topKPerKey]] builds natively — so the naive
    * SQL formulation and the hand-optimized one converge. Tiebreak
    * c_name (unique) keeps the cut deterministic in both engines.
    */
  val q198 = Query(
    "q198_lateral_topk",
    (s, dir) => {
      Tables.nation(s, dir).createOrReplaceTempView("lat_nation")
      Tables.customer(s, dir).createOrReplaceTempView("lat_customer")
      s.sql("""SELECT n.n_name, t.c_name, t.c_acctbal
              |FROM lat_nation n,
              |LATERAL (SELECT c_name, c_acctbal FROM lat_customer c
              |         WHERE c.c_nationkey = n.n_nationkey
              |         ORDER BY c_acctbal DESC, c_name LIMIT 3) t
              |ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""".stripMargin)
    },
    Some("""SELECT n.n_name, t.c_name, t.c_acctbal
           |FROM nation n,
           |LATERAL (SELECT c_name, c_acctbal FROM customer c
           |         WHERE c.c_nationkey = n.n_nationkey
           |         ORDER BY c_acctbal DESC, c_name LIMIT 3) t
           |ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""".stripMargin)
  )

  /** Q200 — the TPC-H Q21 operator shape: multi-correlated EXISTS /
    * NOT EXISTS self-joins against the fact ("suppliers who were the
    * ONLY late supplier on a multi-supplier finished order", restated
    * on this fixture's columns with a fixed lateness cutoff). The
    * point is the plan: Catalyst's RewritePredicateSubquery turns the
    * EXISTS into a LEFT SEMI and the NOT EXISTS into a LEFT ANTI join
    * on l_orderkey (spec-asserted) — each lineitem-side subquery is
    * scanned ONCE and shuffled on the join key, never re-executed per
    * outer row, which is what makes the correlated-SQL form safe at
    * fact scale. Non-equi conjuncts (l_suppkey <>) ride along as join
    * conditions. */
  val q200 = Query(
    "q200_exists_waiters",
    (s, dir) => {
      Tables.supplier(s, dir).createOrReplaceTempView("w_supplier")
      Tables.lineitem(s, dir).createOrReplaceTempView("w_lineitem")
      Tables.orders(s, dir).createOrReplaceTempView("w_orders")
      Tables.nation(s, dir).createOrReplaceTempView("w_nation")
      s.sql("""SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
              |FROM w_supplier, w_lineitem l1, w_orders, w_nation
              |WHERE s_suppkey = l1.l_suppkey
              |  AND o_orderkey = l1.l_orderkey
              |  AND o_orderstatus = 'F'
              |  AND l1.l_shipdate > TIMESTAMP '1999-01-01 00:00:00'
              |  AND EXISTS (SELECT 1 FROM w_lineitem l2
              |              WHERE l2.l_orderkey = l1.l_orderkey
              |                AND l2.l_suppkey <> l1.l_suppkey)
              |  AND NOT EXISTS (SELECT 1 FROM w_lineitem l3
              |                  WHERE l3.l_orderkey = l1.l_orderkey
              |                    AND l3.l_suppkey <> l1.l_suppkey
              |                    AND l3.l_shipdate > TIMESTAMP '1999-01-01 00:00:00')
              |  AND s_nationkey = n_nationkey
              |GROUP BY s_name
              |ORDER BY numwait DESC, s_name""".stripMargin)
    },
    Some("""SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
           |FROM supplier, lineitem l1, orders, nation
           |WHERE s_suppkey = l1.l_suppkey
           |  AND o_orderkey = l1.l_orderkey
           |  AND o_orderstatus = 'F'
           |  AND l1.l_shipdate > TIMESTAMP '1999-01-01 00:00:00'
           |  AND EXISTS (SELECT 1 FROM lineitem l2
           |              WHERE l2.l_orderkey = l1.l_orderkey
           |                AND l2.l_suppkey <> l1.l_suppkey)
           |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
           |                  WHERE l3.l_orderkey = l1.l_orderkey
           |                    AND l3.l_suppkey <> l1.l_suppkey
           |                    AND l3.l_shipdate > TIMESTAMP '1999-01-01 00:00:00')
           |  AND s_nationkey = n_nationkey
           |GROUP BY s_name
           |ORDER BY numwait DESC, s_name""".stripMargin)
  )

  /** Q201 — the TPC-H Q17 operator shape: correlated scalar AGGREGATE
    * subqueries against the fact ("revenue from below-one-fifth-of-
    * average-quantity line items, per brand"). Catalyst decorrelates
    * each scalar subquery into a standalone per-partkey aggregate
    * LEFT-OUTER-joined back on the correlation key — the fact is
    * scanned a bounded number of times total (once per distinct
    * subquery), never per row. The threshold predicate is pure integer
    * arithmetic (5·q·cnt < Σq on BIGINTs — quantities are integral) so
    * the boundary is exact cross-engine; revenue follows the exact-
    * decimal-then-one-division rule. */
  val q201 = Query(
    "q201_corr_agg_smallqty",
    (s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("sq_lineitem")
      Tables.part(s, dir).createOrReplaceTempView("sq_part")
      s.sql("""SELECT p_brand,
              |       CAST(count(*) AS BIGINT) AS n_small,
              |       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
              |            AS DECIMAL(18,4)) AS DOUBLE) / 7.0 AS avg_yearly
              |FROM sq_lineitem l, sq_part p
              |WHERE p.p_partkey = l.l_partkey
              |  AND 5 * CAST(l.l_quantity AS BIGINT) *
              |      (SELECT count(*) FROM sq_lineitem l2
              |       WHERE l2.l_partkey = p.p_partkey)
              |      < (SELECT CAST(SUM(CAST(l3.l_quantity AS BIGINT)) AS BIGINT)
              |         FROM sq_lineitem l3 WHERE l3.l_partkey = p.p_partkey)
              |GROUP BY p_brand
              |ORDER BY p_brand""".stripMargin)
    },
    Some("""SELECT p_brand,
           |       CAST(count(*) AS BIGINT) AS n_small,
           |       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
           |            AS DECIMAL(18,4)) AS DOUBLE) / 7.0 AS avg_yearly
           |FROM lineitem l, part p
           |WHERE p.p_partkey = l.l_partkey
           |  AND 5 * CAST(l.l_quantity AS BIGINT) *
           |      (SELECT count(*) FROM lineitem l2
           |       WHERE l2.l_partkey = p.p_partkey)
           |      < (SELECT CAST(SUM(CAST(l3.l_quantity AS BIGINT)) AS BIGINT)
           |         FROM lineitem l3 WHERE l3.l_partkey = p.p_partkey)
           |GROUP BY p_brand
           |ORDER BY p_brand""".stripMargin)
  )

  /** Q204 — the TPC-H Q22 operator shape: a GLOBAL scalar aggregate
    * subquery (the above-average-balance cutoff — one broadcastable
    * scalar, not correlated) combined with a NOT EXISTS ANTI JOIN
    * against the fact ("wealthy customers who never placed an urgent
    * order"). The average cutoff is restated as two exact-integer
    * scalar subqueries (bal·10⁴ units × count vs unit sum, both
    * BIGINT) so the comparison boundary cannot drift between engines'
    * float summation orders — the q201 device applied to a global
    * aggregate. Plan shape: two tiny scalar-subquery stages + one
    * left-anti join on o_custkey, the fact scanned once. */
  val q204 = Query(
    "q204_global_scalar_anti",
    (s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("gs_customer")
      Tables.orders(s, dir).createOrReplaceTempView("gs_orders")
      s.sql("""SELECT c_nationkey AS cntry, CAST(COUNT(*) AS BIGINT) AS numcust,
              |       CAST(CAST(round(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 4)
              |         AS DECIMAL(18,4)) AS DOUBLE) AS totacctbal
              |FROM gs_customer c
              |WHERE CAST(CAST(c_acctbal AS DECIMAL(18,4)) * 10000 AS BIGINT) *
              |      (SELECT COUNT(*) FROM gs_customer WHERE c_acctbal > 0)
              |      > (SELECT CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,4))
              |                * 10000 AS BIGINT)) AS BIGINT)
              |         FROM gs_customer WHERE c_acctbal > 0)
              |  AND NOT EXISTS (SELECT 1 FROM gs_orders o
              |                  WHERE o.o_custkey = c.c_custkey
              |                    AND o.o_orderpriority = '1-URGENT')
              |GROUP BY c_nationkey ORDER BY cntry""".stripMargin)
    },
    Some("""SELECT c_nationkey AS cntry, CAST(COUNT(*) AS BIGINT) AS numcust,
           |       CAST(CAST(round(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 4)
           |         AS DECIMAL(18,4)) AS DOUBLE) AS totacctbal
           |FROM customer c
           |WHERE CAST(CAST(c_acctbal AS DECIMAL(18,4)) * 10000 AS BIGINT) *
           |      (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0)
           |      > (SELECT CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,4))
           |                * 10000 AS BIGINT)) AS BIGINT)
           |         FROM customer WHERE c_acctbal > 0)
           |  AND NOT EXISTS (SELECT 1 FROM orders o
           |                  WHERE o.o_custkey = c.c_custkey
           |                    AND o.o_orderpriority = '1-URGENT')
           |GROUP BY c_nationkey ORDER BY cntry""".stripMargin)
  )

  val all: Seq[Query] = Seq(q37, q38, q39, q40, q41, q42, q43, q44,
    q45, q46, q47, q48, q49, q58, q59, q60, q61, q62, q69, q70, q75,
    q88, q89, q90, q91, q96, q104, q105, q108, q109, q111, q114, q115, q180, q181,
    q118, q120, q123, q124, q129, q131, q135, q136, q139, q141, q142,
    q144, q148, q149, q153, q156, q159, q160, q161, q166, q190, q197, q198,
    q200, q201, q204)
}
