package graft.operators

import graft.{Canon, Query, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The relational core: every batch operator the reference implements
  * (scan, projection, cleaning, the HyperJoin, dedup/upsert, limits,
  * side-output — SURVEY.md §2.1 O1–O27) plus the declared analytic
  * generalizations (aggregates, windows, set ops, sorts — SURVEY.md §2.2
  * Q1–Q17, Q25–Q26).
  *
  * Design rules (see SURVEY.md §7.4):
  *  - every query ends in a total ORDER BY on a unique key so results are
  *    deterministic and hash-comparable;
  *  - money flows through DECIMAL(18,4) (exact, order-independent sums)
  *    and is cast to DOUBLE only at the output boundary;
  *  - derived integers are emitted as BIGINT on both engines (Spark int
  *    vs DuckDB BIGINT would fail the schema compare);
  *  - join strategy is left to Catalyst + AQE; explicit `broadcast()`
  *    only on tables that stay dimension-sized at 100 TB (nation,
  *    region, supplier, part).
  */
object RelationalOps {
  import Canon._

  /** Q1 — scan + projection + limit. Reference: SELECT * then client-side
    * projection of 7 columns (StreamGeneratorThread.java:54-67); here the
    * projection reaches the parquet scan (ReadSchema pruning).
    */
  val q01 = Query(
    "q01_scan_project",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
          "l_quantity", "l_extendedprice", "l_returnflag")
        // (l_orderkey, l_linenumber) is NOT unique in the fixture; the
        // 6-column prefix is — required for a deterministic LIMIT.
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_quantity", "l_extendedprice")
        .limit(100),
    Some("""SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
           |       l_quantity, l_extendedprice, l_returnflag
           |FROM lineitem
           |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey,
           |         l_quantity, l_extendedprice
           |LIMIT 100""".stripMargin)
  )

  /** Q2 — filter + clean. Reference: currency-strip + parse
    * (MasterDataStreamGeneratorThread.java:46-49) and regex-validate id
    * (createDW.sql:67-80).
    */
  val q02 = Query(
    "q02_filter_clean",
    (s, dir) =>
      Tables.part(s, dir)
        .filter(col("p_size").cast("string").rlike("^[0-9]+$"))
        .select(
          col("p_partkey"),
          col("p_name"),
          regexp_replace(col("p_retailprice").cast("string"), "[$]", "")
            .cast("decimal(18,4)").cast("double").as("price_norm"),
          when(col("p_size").cast("string").rlike("^[0-9]+$"),
            col("p_size").cast("long")).otherwise(lit(null)).as("size_valid"))
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey, p_name,
           |  CAST(CAST(regexp_replace(CAST(p_retailprice AS VARCHAR), '[$]', '') AS DECIMAL(18,4)) AS DOUBLE) AS price_norm,
           |  CASE WHEN regexp_matches(CAST(p_size AS VARCHAR), '^[0-9]+$')
           |       THEN CAST(p_size AS BIGINT) ELSE NULL END AS size_valid
           |FROM part
           |WHERE regexp_matches(CAST(p_size AS VARCHAR), '^[0-9]+$')
           |ORDER BY p_partkey""".stripMargin)
  )

  /** Q3 — the HyperJoin: stream–relation equi inner join + derived sale
    * (StreamGeneratorThread.java:104-144, price×qty at :118). Master side
    * (`part`) is dimension-sized → broadcast; the reference ironically
    * builds its hash on the big side and nested-loops the small one.
    */
  val q03 = Query(
    "q03_hyperjoin",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)),
          col("l_partkey") === col("p_partkey"), "inner")
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_quantity"), col("p_name"),
          (dec12(col("l_extendedprice")) * dec12(col("l_quantity")))
            .cast("double").as("sales"))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_quantity", "sales"),
    Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, p_name,
           |  CAST(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(l_quantity AS DECIMAL(12,4)) AS DOUBLE) AS sales
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, sales""".stripMargin)
  )

  /** Q4 — multi-way star join mirroring the 5-FK fact table
    * (createDW.sql:83-98). Fact side stays shuffle-partitioned; the
    * dimension sides that remain small at 100 TB are broadcast.
    */
  val q04 = Query(
    "q04_star_join",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_quantity"),
          col("c_name"), col("s_name"), col("p_name"),
          (dec12(col("l_extendedprice")) * dec12(col("l_quantity")))
            .cast("double").as("sales"))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_quantity", "sales"),
    Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
           |       c_name, s_name, p_name,
           |  CAST(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(l_quantity AS DECIMAL(12,4)) AS DOUBLE) AS sales
           |FROM lineitem
           |JOIN orders   ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN supplier ON l_suppkey = s_suppkey
           |JOIN part     ON l_partkey = p_partkey
           |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, sales""".stripMargin)
  )

  /** Q5 — last-write-wins keyed dedup/upsert, the intent of the
    * reference's ON DUPLICATE KEY UPDATE loads (createDW.sql:23-26,46-49)
    * and the five keyed dim writers (O17–O21; N1 bug corrected).
    */
  val q05 = Query(
    "q05_dedup_upsert",
    (s, dir) => {
      val w = Window.partitionBy("o_orderkey")
        .orderBy(col("o_orderdate").desc, col("o_totalprice").desc)
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderdate").cast("date").as("o_date"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice, CAST(o_orderdate AS DATE) AS o_date
           |FROM (
           |  SELECT *, row_number() OVER (PARTITION BY o_orderkey
           |            ORDER BY o_orderdate DESC, o_totalprice DESC) AS rn
           |  FROM orders) t
           |WHERE rn = 1
           |ORDER BY o_orderkey""".stripMargin)
  )

  /** Q6 — output limit: first 50 joined outputs by key order
    * (`while (outputCount < 50)`, StreamGeneratorThread.java:107).
    */
  val q06 = Query(
    "q06_limit50",
    (s, dir) => q03.build(s, dir).limit(50),
    q03.oracle.map(_.replace("LIMIT 100", "").stripSuffix("\n") + " LIMIT 50")
  )

  /** Q7 — left outer join: unmatched masters survive with null fill
    * (converse of the reference's inner semantics, O10 boundary).
    * NULLS FIRST is stated explicitly: Spark default for ASC is
    * nulls-first, DuckDB default is nulls-last.
    */
  val q07 = Query(
    "q07_left_join",
    (s, dir) =>
      Tables.part(s, dir)
        .join(Tables.lineitem(s, dir), col("p_partkey") === col("l_partkey"), "left")
        .select(col("p_partkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"))
        .orderBy(col("p_partkey").asc,
          col("l_orderkey").asc_nulls_first,
          col("l_linenumber").asc_nulls_first,
          col("l_quantity").asc_nulls_first),
    Some("""SELECT p_partkey, l_orderkey, l_linenumber, l_quantity
           |FROM part LEFT JOIN lineitem ON p_partkey = l_partkey
           |ORDER BY p_partkey ASC, l_orderkey ASC NULLS FIRST,
           |         l_linenumber ASC NULLS FIRST, l_quantity ASC NULLS FIRST""".stripMargin)
  )

  /** Q8 — left semi join: "a matching record exists"
    * (StreamGeneratorThread.java:116). */
  val q08 = Query(
    "q08_semi_join",
    (s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
    Some("""SELECT c_custkey, c_name FROM customer
           |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
           |ORDER BY c_custkey""".stripMargin)
  )

  /** Q9 — left anti join: FK-integrity audit (createDW.sql:93-97);
    * customers that never ordered. */
  val q09 = Query(
    "q09_anti_join",
    (s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey"),
    Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
           |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
           |ORDER BY c_custkey""".stripMargin)
  )

  /** Q10 — side-output accumulator: the sorted distinct matched product
    * ids the reference collects into a static list
    * (productIDsToUpdate, StreamGeneratorThread.java:132,396), emitted
    * as rows (portable across engines, unlike array payloads).
    */
  val q10 = Query(
    "q10_matched_keys",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .select(col("l_partkey").as("matched_partkey"))
        .distinct()
        .orderBy("matched_partkey"),
    Some("""SELECT DISTINCT l_partkey AS matched_partkey
           |FROM lineitem WHERE EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey)
           |ORDER BY matched_partkey""".stripMargin)
  )

  /** Q11 — hash aggregate, TPC-H Q1 shape (the "customer shopping
    * behavior analysis" mandate, README.md:6). Partial aggregation
    * (map-side combine) is automatic for hash aggregates.
    */
  val q11 = Query(
    "q11_groupby_agg",
    (s, dir) => {
      val one = lit(1).cast("decimal(8,4)")
      val li = Tables.lineitem(s, dir)
      val disc = one - col("l_discount").cast("decimal(8,4)")
      val tax = one + col("l_tax").cast("decimal(8,4)")
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          outD(sum(dec12(col("l_extendedprice")) * disc)).as("sum_disc_price"),
          outD(sum(dec12(col("l_extendedprice")) * disc * tax)).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
           |  CAST(CAST(round(SUM(CAST(l_quantity AS DECIMAL(18,4))), 4) AS DECIMAL(18,4)) AS DOUBLE) AS sum_qty,
           |  CAST(CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 4) AS DECIMAL(18,4)) AS DOUBLE) AS sum_base_price,
           |  CAST(CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))), 4) AS DECIMAL(18,4)) AS DOUBLE) AS sum_disc_price,
           |  CAST(CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4))) * (CAST(1 AS DECIMAL(8,4)) + CAST(l_tax AS DECIMAL(8,4)))), 4) AS DECIMAL(18,4)) AS DOUBLE) AS sum_charge,
           |  CAST(CAST(round(SUM(CAST(l_quantity AS DECIMAL(18,4))), 4) AS DECIMAL(18,4)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
           |  CAST(CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 4) AS DECIMAL(18,4)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_price,
           |  COUNT(*) AS count_order
           |FROM lineitem
           |GROUP BY l_returnflag, l_linestatus
           |ORDER BY l_returnflag, l_linestatus""".stripMargin)
  )

  /** Q12 — exact distinct aggregate. The HLL `approx_count_distinct`
    * variant lives in q12b (rows-only check: approximation is
    * engine-specific by design).
    */
  val q12 = Query(
    "q12_distinct_agg",
    (s, dir) =>
      Tables.orders(s, dir)
        .groupBy("o_orderpriority")
        .agg(
          countDistinct(col("o_custkey")).as("n_cust"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_orders
           |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  )

  /** Q12b — approximate distinct (HyperLogLog++). Excluded from the hash
    * oracle (SURVEY.md §7.4): sketches are engine-specific. */
  val q12b = Query(
    "q12b_approx_distinct",
    (s, dir) =>
      Tables.orders(s, dir)
        .groupBy("o_orderpriority")
        .agg(approx_count_distinct(col("o_custkey")).as("approx_cust"))
        .orderBy("o_orderpriority"),
    None
  )

  private def ordersWithNation(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))

  /** Q13a — ROLLUP. Null group keys are coalesced to a sentinel and the
    * grouping level is materialized explicitly — null-ordering and
    * grouping-id bit conventions differ across engines.
    */
  val q13a = Query(
    "q13a_rollup",
    (s, dir) => {
      // DataFrame rollup + grouping() trips the ambiguous-self-join
      // analyzer check on join outputs; the SQL surface resolves it
      // cleanly (and exercises the engine's SQL entry point).
      ordersWithNation(s, dir)
        .select("n_name", "o_orderpriority", "o_totalprice")
        .createOrReplaceTempView("rollup_base")
      s.sql(
        """SELECT COALESCE(n_name, 'ALL') AS grp_nation,
          |       COALESCE(o_orderpriority, 'ALL') AS grp_prio,
          |       CAST(grouping(n_name)*2 + grouping(o_orderpriority) AS BIGINT) AS lvl,
          |       CAST(CAST(round(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 4) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
          |       COUNT(*) AS n
          |FROM rollup_base
          |GROUP BY ROLLUP(n_name, o_orderpriority)
          |ORDER BY lvl, grp_nation, grp_prio""".stripMargin)
    },
    Some("""SELECT COALESCE(n_name, 'ALL') AS grp_nation,
           |       COALESCE(o_orderpriority, 'ALL') AS grp_prio,
           |       CAST(GROUPING(n_name)*2 + GROUPING(o_orderpriority) AS BIGINT) AS lvl,
           |       CAST(CAST(round(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 4) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
           |       COUNT(*) AS n
           |FROM orders
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation   ON c_nationkey = n_nationkey
           |GROUP BY ROLLUP(n_name, o_orderpriority)
           |ORDER BY lvl, grp_nation, grp_prio""".stripMargin)
  )

  /** Q13b — CUBE over lineitem flags. */
  val q13b = Query(
    "q13b_cube",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .cube("l_returnflag", "l_linestatus")
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"),
          (grouping(col("l_returnflag")).cast("long") * 2 +
            grouping(col("l_linestatus")).cast("long")).as("lvl"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("grp_flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("grp_status"),
          col("lvl"), col("sum_qty"), col("n"))
        .orderBy("lvl", "grp_flag", "grp_status"),
    Some("""SELECT COALESCE(l_returnflag, 'ALL') AS grp_flag,
           |       COALESCE(l_linestatus, 'ALL') AS grp_status,
           |       CAST(GROUPING(l_returnflag)*2 + GROUPING(l_linestatus) AS BIGINT) AS lvl,
           |       CAST(CAST(round(SUM(CAST(l_quantity AS DECIMAL(18,4))), 4) AS DECIMAL(18,4)) AS DOUBLE) AS sum_qty,
           |       COUNT(*) AS n
           |FROM lineitem
           |GROUP BY CUBE(l_returnflag, l_linestatus)
           |ORDER BY lvl, grp_flag, grp_status""".stripMargin)
  )

  /** Q14 — ranking window functions: top-3 customers by spend per nation.
    * row_number gets a unique tiebreak (c_custkey) for determinism;
    * rank/dense_rank are deterministic given the same ordering input.
    * All rank outputs emitted as BIGINT on both engines.
    */
  val q14 = Query(
    "q14_window_rank",
    (s, dir) => {
      val spend = ordersWithNation(s, dir)
        .groupBy("n_name", "c_custkey", "c_name")
        .agg(dsum(col("o_totalprice")).as("spend"))
      val w = Window.partitionBy("n_name")
        .orderBy(col("spend").desc, col("c_custkey").asc)
      spend
        .withColumn("rk", rank().over(w).cast("long"))
        .withColumn("drk", dense_rank().over(w).cast("long"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .orderBy("n_name", "rn")
    },
    Some("""SELECT n_name, c_custkey, c_name, spend,
           |       CAST(rank()       OVER w AS BIGINT) AS rk,
           |       CAST(dense_rank() OVER w AS BIGINT) AS drk,
           |       CAST(row_number() OVER w AS BIGINT) AS rn
           |FROM (
           |  SELECT n_name, c_custkey, c_name,
           |         CAST(CAST(round(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 4) AS DECIMAL(18,4)) AS DOUBLE) AS spend
           |  FROM orders
           |  JOIN customer ON o_custkey = c_custkey
           |  JOIN nation   ON c_nationkey = n_nationkey
           |  GROUP BY n_name, c_custkey, c_name) t
           |WINDOW w AS (PARTITION BY n_name ORDER BY spend DESC, c_custkey ASC)
           |QUALIFY row_number() OVER w <= 3
           |ORDER BY n_name, rn""".stripMargin)
  )

  /** Q15 — analytic window functions with an explicit ROWS frame:
    * running revenue per customer. Frame order carries a unique
    * tiebreak (o_orderkey) so lag/lead/running sums are deterministic.
    */
  val q15 = Query(
    "q15_window_frames",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      Tables.orders(s, dir)
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
        .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
        .withColumn("running",
          outD(sum(dec(col("o_totalprice")))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
        .select("o_custkey", "o_orderkey", "o_totalprice",
          "prev_price", "next_price", "running")
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice,
           |  lag(o_totalprice)  OVER w AS prev_price,
           |  lead(o_totalprice) OVER w AS next_price,
           |  CAST(CAST(round(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
           |       OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS DECIMAL(18,4)) AS DOUBLE) AS running
           |FROM orders
           |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
           |ORDER BY o_custkey, o_orderkey""".stripMargin)
  )

  /** Q16 — global top-k: plans as TakeOrderedAndProject (no full sort at
    * scale — each partition keeps k rows, driver merges). */
  val q16 = Query(
    "q16_topk",
    (s, dir) =>
      Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10),
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
           |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin)
  )

  /** Q17 — set operations over two customer-key predicates: rich
    * accounts vs customers that actually ordered. One tagged output
    * exercises UNION ALL / UNION / INTERSECT / EXCEPT at once.
    */
  val q17 = Query(
    "q17_setops",
    (s, dir) => {
      val rich = Tables.customer(s, dir)
        .filter(col("c_acctbal") > 5000).select("c_custkey")
      val active = Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey")
      rich.unionAll(active).select(lit("union_all").as("op"), col("c_custkey"))
        .unionByName(rich.union(active).distinct()
          .select(lit("union_distinct").as("op"), col("c_custkey")))
        .unionByName(rich.intersect(active)
          .select(lit("intersect").as("op"), col("c_custkey")))
        .unionByName(rich.except(active)
          .select(lit("except").as("op"), col("c_custkey")))
        .orderBy("op", "c_custkey")
    },
    Some("""WITH rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
           |active AS (SELECT c_custkey FROM customer
           |           WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey))
           |SELECT 'union_all' AS op, c_custkey FROM (SELECT c_custkey FROM rich UNION ALL SELECT c_custkey FROM active) t
           |UNION ALL SELECT 'union_distinct', c_custkey FROM (SELECT c_custkey FROM rich UNION SELECT c_custkey FROM active) t
           |UNION ALL SELECT 'intersect', c_custkey FROM (SELECT c_custkey FROM rich INTERSECT SELECT c_custkey FROM active) t
           |UNION ALL SELECT 'except', c_custkey FROM (SELECT c_custkey FROM rich EXCEPT SELECT c_custkey FROM active) t
           |ORDER BY op, c_custkey""".stripMargin)
  )

  /** Q25 — scalar-function battery: string / date / math / array
    * built-ins in one projection (all codegen'd `functions._`, no UDFs).
    * Derived ints as BIGINT; doubles restricted to exact passthrough or
    * single IEEE ops so both engines agree bitwise.
    */
  val q25 = Query(
    "q25_scalar_battery",
    (s, dir) =>
      // top-k FIRST on the raw sort keys, wide projection AFTER: the
      // 20-expression battery runs on 200 rows, not 600k (Catalyst does
      // not push TakeOrdered below a projection of computed columns)
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_quantity", "l_extendedprice", "l_discount", "l_tax",
          "l_returnflag", "l_linestatus", "l_shipdate",
          "p_name", "p_brand", "p_type")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_quantity", "l_extendedprice")
        .limit(200)
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_quantity"), col("l_extendedprice"),
          upper(substring(col("p_name"), 1, 5)).as("s_upper"),
          concat_ws("_", trim(col("p_brand")), col("p_type")).as("s_concat"),
          length(col("p_name")).cast("long").as("s_len"),
          lpad(col("l_returnflag"), 3, "x").as("s_pad"),
          year(col("l_shipdate")).cast("long").as("d_year"),
          month(col("l_shipdate")).cast("long").as("d_month"),
          dayofmonth(col("l_shipdate")).cast("long").as("d_day"),
          date_trunc("month", col("l_shipdate")).cast("date").as("d_trunc"),
          datediff(col("l_shipdate").cast("date"), lit("1994-01-01").cast("date"))
            .cast("long").as("d_diff"),
          abs(col("l_discount") - lit(0.05)).as("m_abs"),
          floor(col("l_extendedprice")).cast("long").as("m_floor"),
          ceil(col("l_extendedprice")).cast("long").as("m_ceil"),
          pmod(col("l_orderkey"), lit(7)).cast("long").as("m_pmod"),
          size(array(col("l_quantity"), col("l_tax"), col("l_discount")))
            .cast("long").as("a_size"),
          sort_array(array(col("l_quantity"), col("l_tax"), col("l_discount")))
            .getItem(0).as("a_min"),
          array_contains(array(col("l_returnflag"), col("l_linestatus")), "A")
            .as("a_has_a"))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_quantity", "l_extendedprice"),
    Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice,
           |  upper(substr(p_name, 1, 5)) AS s_upper,
           |  concat(trim(p_brand), '_', p_type) AS s_concat,
           |  CAST(length(p_name) AS BIGINT) AS s_len,
           |  lpad(l_returnflag, 3, 'x') AS s_pad,
           |  CAST(EXTRACT(year  FROM l_shipdate) AS BIGINT) AS d_year,
           |  CAST(EXTRACT(month FROM l_shipdate) AS BIGINT) AS d_month,
           |  CAST(EXTRACT(day   FROM l_shipdate) AS BIGINT) AS d_day,
           |  CAST(date_trunc('month', l_shipdate) AS DATE) AS d_trunc,
           |  CAST(datediff('day', DATE '1994-01-01', CAST(l_shipdate AS DATE)) AS BIGINT) AS d_diff,
           |  abs(l_discount - 0.05) AS m_abs,
           |  CAST(floor(l_extendedprice) AS BIGINT) AS m_floor,
           |  CAST(ceil(l_extendedprice) AS BIGINT) AS m_ceil,
           |  CAST(l_orderkey % 7 AS BIGINT) AS m_pmod,
           |  CAST(len([l_quantity, l_tax, l_discount]) AS BIGINT) AS a_size,
           |  list_sort([l_quantity, l_tax, l_discount])[1] AS a_min,
           |  list_contains([l_returnflag, l_linestatus], 'A') AS a_has_a
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey,
           |         l_quantity, l_extendedprice
           |LIMIT 200""".stripMargin)
  )

  /** Q26 — GROUPING SETS via the SQL surface (SparkSession.sql over temp
    * views), proving the engine's SQL entry point alongside the
    * DataFrame API.
    */
  val q26 = Query(
    "q26_grouping_sets",
    (s, dir) => {
      ordersWithNation(s, dir)
        .join(broadcast(Tables.region(s, dir)),
          col("n_regionkey") === col("r_regionkey"))
        .select("r_name", "n_name", "o_orderpriority", "o_totalprice")
        .createOrReplaceTempView("gs_base")
      s.sql(
        """SELECT COALESCE(r_name, 'ALL') AS grp_region,
          |       COALESCE(n_name, 'ALL') AS grp_nation,
          |       COALESCE(o_orderpriority, 'ALL') AS grp_prio,
          |       CAST(grouping(r_name)*4 + grouping(n_name)*2 + grouping(o_orderpriority) AS BIGINT) AS lvl,
          |       CAST(CAST(round(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 4) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
          |       COUNT(*) AS n
          |FROM gs_base
          |GROUP BY GROUPING SETS ((r_name, n_name), (n_name), (o_orderpriority), ())
          |ORDER BY lvl, grp_region, grp_nation, grp_prio""".stripMargin)
    },
    Some("""SELECT COALESCE(r_name, 'ALL') AS grp_region,
           |       COALESCE(n_name, 'ALL') AS grp_nation,
           |       COALESCE(o_orderpriority, 'ALL') AS grp_prio,
           |       CAST(GROUPING(r_name)*4 + GROUPING(n_name)*2 + GROUPING(o_orderpriority) AS BIGINT) AS lvl,
           |       CAST(CAST(round(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 4) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
           |       COUNT(*) AS n
           |FROM orders
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation   ON c_nationkey = n_nationkey
           |JOIN region   ON n_regionkey = r_regionkey
           |GROUP BY GROUPING SETS ((r_name, n_name), (n_name), (o_orderpriority), ())
           |ORDER BY lvl, grp_region, grp_nation, grp_prio""".stripMargin)
  )

  /** Q84 — CDC changelog apply: materialize a table's final state from
    * an insert/update/delete event log — the general form of the
    * reference's `ON DUPLICATE KEY UPDATE` maintenance (createDW.sql:
    * 12-16,99-102), which cannot express deletes at all. The changelog
    * is synthesized deterministically from `orders`: every key inserts
    * at seq 1; keys with md5%3=1 get an update (price +10%) at seq 2;
    * keys with md5%3=2 get a delete at seq 3. Apply = LWW by (key, max
    * seq) then drop rows whose last op is D — one shuffle on the key,
    * the same shape at any scale, and exactly what a Delta/Iceberg
    * MERGE does under the hood. */
  val q84 = Query(
    "q84_cdc_apply",
    (s, dir) => {
      // orders carries duplicate keys (q05 exists to dedup them) —
      // without this the synthetic seq-1 inserts would tie and make LWW
      // nondeterministic
      val wDedup = Window.partitionBy("o_orderkey")
        .orderBy(col("o_orderdate").desc, col("o_totalprice").desc)
      val base = Tables.orders(s, dir)
        .withColumn("rn0", row_number().over(wDedup))
        .filter(col("rn0") === 1)
        .select(col("o_orderkey"), col("o_totalprice"),
          Canon.md5Residue(col("o_orderkey").cast("string"), 3).as("grp"))
      val inserts = base.select(col("o_orderkey"), lit("I").as("op"),
        col("o_totalprice").cast("decimal(18,4)").as("price"), lit(1L).as("seq"))
      val updates = base.filter(col("grp") === 1)
        .select(col("o_orderkey"), lit("U").as("op"),
          (col("o_totalprice").cast("decimal(18,4)") * lit(1.1).cast("decimal(6,2)"))
            .cast("decimal(18,4)").as("price"), lit(2L).as("seq"))
      val deletes = base.filter(col("grp") === 2)
        .select(col("o_orderkey"), lit("D").as("op"),
          lit(null).cast("decimal(18,4)").as("price"), lit(3L).as("seq"))
      val log = inserts.unionByName(updates).unionByName(deletes)
      val w = Window.partitionBy("o_orderkey").orderBy(col("seq").desc)
      log.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("op") =!= "D")
        .select(col("o_orderkey"), col("op").as("last_op"),
          col("price").cast("double").as("price"), col("seq").as("n_seq"))
        .orderBy("o_orderkey")
    },
    Some("""WITH base AS (
           |  SELECT o_orderkey, o_totalprice,
           |         CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) % 3 AS grp
           |  FROM (
           |    SELECT *, row_number() OVER (PARTITION BY o_orderkey
           |              ORDER BY o_orderdate DESC, o_totalprice DESC) AS rn0
           |    FROM orders) d
           |  WHERE rn0 = 1),
           |log AS (
           |  SELECT o_orderkey, 'I' AS op,
           |         CAST(o_totalprice AS DECIMAL(18,4)) AS price, 1 AS seq FROM base
           |  UNION ALL
           |  SELECT o_orderkey, 'U',
           |         CAST(CAST(o_totalprice AS DECIMAL(18,4)) * CAST(1.1 AS DECIMAL(6,2)) AS DECIMAL(18,4)), 2
           |  FROM base WHERE grp = 1
           |  UNION ALL
           |  SELECT o_orderkey, 'D', NULL, 3 FROM base WHERE grp = 2)
           |SELECT o_orderkey, op AS last_op,
           |       CAST(price AS DOUBLE) AS price, CAST(seq AS BIGINT) AS n_seq
           |FROM (
           |  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
           |  FROM log) t
           |WHERE rn = 1 AND op <> 'D'
           |ORDER BY o_orderkey""".stripMargin)
  )

  /** Q101 — keyed snapshot diff: given two versions of a keyed table,
    * classify every key as added / removed / changed / unchanged and
    * roll up per-status counts with an exact value checksum. This is
    * the audit step behind every incremental load (the reference's
    * ON DUPLICATE KEY UPDATE loads, createDW.sql:23-26, change rows
    * silently; a diff makes the change set first-class). Versions are
    * synthesized deterministically from `orders`: v_old drops keys
    * ≡0 (mod 11), v_new drops ≡0 (mod 13) and bumps the totalprice of
    * keys ≡0 (mod 7) by 1.0000.
    *
    * Scale shape: one full-outer join on the key (both sides shuffle
    * on o_orderkey, no broadcast), then a constant-sized status
    * rollup; the checksum is an exact decimal sum, order-independent.
    */
  val q101 = Query(
    "q101_table_diff",
    (s, dir) => {
      val base = Tables.orders(s, dir)
      val vOld = base.filter(pmod(col("o_orderkey"), lit(11)) =!= 0)
        .select(col("o_orderkey").as("k"),
          Canon.dec(col("o_totalprice")).as("v_old"))
      val vNew = base.filter(pmod(col("o_orderkey"), lit(13)) =!= 0)
        .select(col("o_orderkey").as("k"),
          (Canon.dec(col("o_totalprice")) +
            when(pmod(col("o_orderkey"), lit(7)) === 0, Canon.dec(lit(1.0)))
              .otherwise(Canon.dec(lit(0.0)))).cast("decimal(18,4)").as("v_new"))
      vOld.join(vNew, Seq("k"), "full_outer")
        .select(col("k"),
          when(col("v_old").isNull, lit("added"))
            .when(col("v_new").isNull, lit("removed"))
            .when(col("v_old") =!= col("v_new"), lit("changed"))
            .otherwise(lit("unchanged")).as("status"),
          coalesce(col("v_new"), col("v_old")).as("v"))
        .groupBy("status")
        .agg(count(lit(1)).as("n"),
          Canon.outD(sum(col("v"))).as("checksum"))
        .orderBy("status")
    },
    Some("""WITH v_old AS (
           |  SELECT o_orderkey AS k, CAST(o_totalprice AS DECIMAL(18,4)) AS v_old
           |  FROM orders WHERE o_orderkey % 11 <> 0),
           |v_new AS (
           |  SELECT o_orderkey AS k,
           |         CAST(CAST(o_totalprice AS DECIMAL(18,4)) +
           |              CASE WHEN o_orderkey % 7 = 0 THEN CAST(1.0 AS DECIMAL(18,4))
           |                   ELSE CAST(0.0 AS DECIMAL(18,4)) END AS DECIMAL(18,4)) AS v_new
           |  FROM orders WHERE o_orderkey % 13 <> 0),
           |d AS (
           |  SELECT COALESCE(o.k, n.k) AS k,
           |         CASE WHEN o.v_old IS NULL THEN 'added'
           |              WHEN n.v_new IS NULL THEN 'removed'
           |              WHEN o.v_old <> n.v_new THEN 'changed'
           |              ELSE 'unchanged' END AS status,
           |         COALESCE(n.v_new, o.v_old) AS v
           |  FROM v_old o FULL OUTER JOIN v_new n ON o.k = n.k)
           |SELECT status, COUNT(*) AS n,
           |       CAST(CAST(round(SUM(v), 4) AS DECIMAL(18,4)) AS DOUBLE) AS checksum
           |FROM d GROUP BY status ORDER BY status""".stripMargin)
  )

  /** Q147 — the TPC-H Q5 shape: six-table join (fact ⋈ orders ⋈
    * customer ⋈ supplier ⋈ nation ⋈ region) with the LOCAL-supplier
    * correlation `c_nationkey = s_nationkey`, a selective year filter
    * on orders and a region filter — the canonical multi-way
    * join-order stress test, here over the fixture's own TPC-H-ish
    * tables.
    *
    * Scale shape: nation/region are calendar-bounded and broadcast
    * explicitly; customer/supplier/orders are LEFT to Catalyst + AQE —
    * at 100 TB none of them is broadcast-safe, and the declarative
    * form lets the optimizer pick shuffle-hash vs sort-merge per
    * stage and re-order the joins from runtime stats (hand-fixing an
    * order here would freeze today's cardinalities into the plan).
    * The year filter reaches the orders scan as a pushed predicate;
    * the region filter prunes nations before the broadcast.
    *
    * Exactness: q11's proven decimal device for Σ price·(1−discount).
    */
  val q147 = Query(
    "q147_tpch_regional",
    (s, dir) => {
      val one = lit(1).cast("decimal(8,4)")
      val li = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      val ord = Tables.orders(s, dir)
        .filter(year(col("o_orderdate")) === 1996)
        .select("o_orderkey", "o_custkey")
      val cust = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
      val supp = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
      val nat = Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir)
            .filter(col("r_name") === "ASIA").select("r_regionkey")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"))
        .agg(count(lit(1)).as("n_items"),
          outD(round(sum(dec12(col("l_extendedprice")) *
            (one - col("l_discount").cast("decimal(8,4)"))), 4)).as("revenue"))
        .orderBy("nation")
    },
    Some("""SELECT n_name AS nation, COUNT(*) AS n_items,
           |       CAST(CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) *
           |            (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))), 4)
           |            AS DECIMAL(18,4)) AS DOUBLE) AS revenue
           |FROM lineitem
           |JOIN orders   ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
           |JOIN nation   ON s_nationkey = n_nationkey
           |JOIN region   ON n_regionkey = r_regionkey
           |WHERE r_name = 'ASIA' AND year(o_orderdate) = 1996
           |GROUP BY 1 ORDER BY nation""".stripMargin)
  )

  /** Q182 — the TPC-H Q7 "volume shipping" shape: bilateral trade
    * revenue between two nations, grouped by (supplier nation, customer
    * nation, ship year), both directions of the pair reported. The
    * canonical two-dimension-role join — the SAME dimension (nation)
    * joined twice under different roles, which is exactly what defeats
    * naive join-reorder heuristics that assume each table appears once.
    *
    * Scale shape: nation is broadcast twice (different role aliases,
    * each a distinct broadcast literal side); the year predicate on
    * l_shipdate is pushed to the fact scan; customer/supplier/orders
    * stay shuffle-joined under Catalyst+AQE as in q147. The nation-pair
    * filter applies AFTER both role joins (it references both sides),
    * but each role side is pre-filtered to the two candidate nations so
    * the broadcast rows and the post-join fan-in stay minimal.
    *
    * Exactness: q11's decimal device for Σ price·(1−discount).
    */
  val q182 = Query(
    "q182_volume_shipping",
    (s, dir) => {
      val one = lit(1).cast("decimal(8,4)")
      val pair = Seq("NATION_11", "NATION_20")
      val natS = Tables.nation(s, dir).filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val natC = Tables.nation(s, dir).filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, dir)
        .filter(year(col("l_shipdate")).between(1995, 1996))
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
          "l_shipdate")
        .join(Tables.supplier(s, dir).select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(natS), col("s_nationkey") === col("sn_key"))
        .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir).select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(natC), col("c_nationkey") === col("cn_key"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(count(lit(1)).as("n_items"),
          outD(round(sum(dec12(col("l_extendedprice")) *
            (one - col("l_discount").cast("decimal(8,4)"))), 4)).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },
    Some("""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           |       CAST(year(l_shipdate) AS BIGINT) AS l_year,
           |       COUNT(*) AS n_items,
           |       CAST(CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) *
           |            (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))), 4)
           |            AS DECIMAL(18,4)) AS DOUBLE) AS revenue
           |FROM lineitem
           |JOIN supplier ON l_suppkey = s_suppkey
           |JOIN nation sn ON s_nationkey = sn.n_nationkey
           |JOIN orders   ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation cn ON c_nationkey = cn.n_nationkey
           |WHERE year(l_shipdate) BETWEEN 1995 AND 1996
           |  AND sn.n_name IN ('NATION_11', 'NATION_20')
           |  AND cn.n_name IN ('NATION_11', 'NATION_20')
           |  AND sn.n_name <> cn.n_name
           |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)
  )

  /** Q183 — the TPC-H Q8 "national market share" shape: of all PROMO-part
    * revenue sold to ASIA customers, what fraction was supplied by
    * NATION_2, per order year? The numerator is a CONDITIONAL sum inside
    * the same aggregation as the denominator — one pass over the joined
    * fact, not two queries diffed.
    *
    * Scale shape: part is pre-filtered on p_type before its join (at
    * 100 TB part is the one dimension that can outgrow broadcast, so it
    * is left to Catalyst; the selective type filter still prunes it
    * scan-side), region→nation is the broadcast calendar side as in
    * q147, and the supplier-nation name needed by the numerator rides a
    * second broadcast of nation keyed by s_nationkey.
    *
    * Exactness: numerator and denominator are separately rounded,
    * clamped exact decimals; the share is their single IEEE division
    * (q159's ratio discipline).
    */
  val q183 = Query(
    "q183_market_share",
    (s, dir) => {
      val one = lit(1).cast("decimal(8,4)")
      val vol = dec12(col("l_extendedprice")) *
        (one - col("l_discount").cast("decimal(8,4)"))
      val natC = Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir)
            .filter(col("r_name") === "ASIA").select("r_regionkey")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("cn_key"))
      val natS = Tables.nation(s, dir)
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      Tables.lineitem(s, dir)
        .select("l_orderkey", "l_partkey", "l_suppkey",
          "l_extendedprice", "l_discount")
        .join(Tables.part(s, dir).filter(col("p_type") === "PROMO")
            .select("p_partkey"),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.supplier(s, dir).select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(natS), col("s_nationkey") === col("sn_key"))
        .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey",
            "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir).select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(natC), col("c_nationkey") === col("cn_key"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          // SUM ignores NULLs in both engines, so the no-ELSE CASE form
          // keeps the conditional branch in the product's own decimal
          // type with no zero-literal type gymnastics; a year with no
          // NATION_2 revenue yields NULL in both engines identically.
          outD(round(sum(when(col("supp_nation") === "NATION_2", vol)), 4))
            .as("nation_volume"),
          outD(round(sum(vol), 4)).as("total_volume"))
        .withColumn("mkt_share",
          col("nation_volume") / col("total_volume"))
        .orderBy("o_year")
    },
    Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           |       CAST(CAST(round(SUM(CASE WHEN sn.n_name = 'NATION_2'
           |              THEN CAST(l_extendedprice AS DECIMAL(12,4)) *
           |                   (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))
           |              END), 4)
           |            AS DECIMAL(18,4)) AS DOUBLE) AS nation_volume,
           |       CAST(CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) *
           |            (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))), 4)
           |            AS DECIMAL(18,4)) AS DOUBLE) AS total_volume,
           |       CAST(CAST(round(SUM(CASE WHEN sn.n_name = 'NATION_2'
           |              THEN CAST(l_extendedprice AS DECIMAL(12,4)) *
           |                   (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))
           |              END), 4)
           |            AS DECIMAL(18,4)) AS DOUBLE)
           |       / CAST(CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) *
           |            (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))), 4)
           |            AS DECIMAL(18,4)) AS DOUBLE) AS mkt_share
           |FROM lineitem
           |JOIN part     ON l_partkey = p_partkey
           |JOIN supplier ON l_suppkey = s_suppkey
           |JOIN nation sn ON s_nationkey = sn.n_nationkey
           |JOIN orders   ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation cn ON c_nationkey = cn.n_nationkey
           |JOIN region   ON cn.n_regionkey = r_regionkey
           |WHERE p_type = 'PROMO' AND r_name = 'ASIA'
           |GROUP BY 1 ORDER BY 1""".stripMargin)
  )

  /** Q184 — the TPC-H Q10 "returned items" shape: the top 20 customers
    * by revenue lost to returns (l_returnflag = 'R') in one order year —
    * the classic fact-filtered top-k customer report.
    *
    * Scale shape: the returnflag + year predicates are pushed to the
    * two fact-side scans; the customer join shuffles on the key; the
    * final top-20 is a global sort-limit, which Spark executes as
    * per-partition TakeOrdered (no full sort materializes). Revenue
    * ties break on c_custkey so the LIMIT is deterministic.
    */
  val q184 = Query(
    "q184_returned_items",
    (s, dir) => {
      val one = lit(1).cast("decimal(8,4)")
      Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .join(Tables.orders(s, dir)
            .filter(year(col("o_orderdate")) === 1996)
            .select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir)
            .select("c_custkey", "c_name", "c_nationkey", "c_acctbal"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)
            .select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name").as("nation"),
          dec(col("c_acctbal")).cast("double").as("c_acctbal"))
        .agg(count(lit(1)).as("n_items"),
          outD(round(sum(dec12(col("l_extendedprice")) *
            (one - col("l_discount").cast("decimal(8,4)"))), 4)).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    },
    Some("""SELECT c_custkey, c_name, n_name AS nation,
           |       CAST(CAST(c_acctbal AS DECIMAL(18,4)) AS DOUBLE) AS c_acctbal,
           |       COUNT(*) AS n_items,
           |       CAST(CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) *
           |            (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))), 4)
           |            AS DECIMAL(18,4)) AS DOUBLE) AS revenue
           |FROM lineitem
           |JOIN orders   ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation   ON c_nationkey = n_nationkey
           |WHERE l_returnflag = 'R' AND year(o_orderdate) = 1996
           |GROUP BY 1, 2, 3, 4
           |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin)
  )

  /** Q192 — joinability / foreign-key discovery: for each candidate
    * (child column → parent column) pair, the inclusion coefficient
    * |child ∩ parent| / |child| over distinct non-null keys, orphan
    * counts, and an integer-exact `fk_like` verdict (zero orphans).
    * This is the schema-profiling pass that infers the star schema the
    * reference hand-declares as DDL (createDW.sql:93-97 writes five FK
    * constraints; this query DISCOVERS them from the data — and its FK
    * audit counterpart q09 then enforces them). The candidate list
    * includes a deliberate negative (customer.nationkey → region key:
    * inclusion 0.2) so the readout demonstrably discriminates.
    *
    * Scale shape per pair: one distinct-project per side (combinable,
    * key-grain) + one left-semi join on the key — never a row-grain
    * join; the six pair subplans are independent and union into a
    * six-row result. The Spark pairs and the oracle SQL are generated
    * from ONE candidate list so they cannot drift.
    */
  private val fkCandidates: Seq[(String, String, String, String, String)] = Seq(
    // (label, child table, child col, parent table, parent col)
    ("lineitem.l_orderkey->orders.o_orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part.p_partkey", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier.s_suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer.c_custkey", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation.n_nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("customer.c_nationkey->region.r_regionkey", "customer", "c_nationkey", "region", "r_regionkey"))

  val q192 = Query(
    "q192_fk_discovery",
    (s, dir) => {
      def table(name: String): DataFrame = name match {
        case "lineitem" => Tables.lineitem(s, dir)
        case "orders" => Tables.orders(s, dir)
        case "part" => Tables.part(s, dir)
        case "supplier" => Tables.supplier(s, dir)
        case "customer" => Tables.customer(s, dir)
        case "nation" => Tables.nation(s, dir)
        case "region" => Tables.region(s, dir)
      }
      fkCandidates.map { case (label, ct, cc, pt, pc) =>
        val child = table(ct).select(col(cc).cast("long").as("k"))
          .filter(col("k").isNotNull).distinct()
        val parent = table(pt).select(col(pc).cast("long").as("k"))
          .filter(col("k").isNotNull).distinct()
        val nc = child.agg(count(lit(1)).as("child_keys"))
        val np = parent.agg(count(lit(1)).as("parent_keys"))
        val ni = child.join(parent, Seq("k"), "left_semi")
          .agg(count(lit(1)).as("shared_keys"))
        nc.crossJoin(np).crossJoin(ni)
          .select(lit(label).as("candidate"),
            col("child_keys"), col("parent_keys"), col("shared_keys"),
            (col("child_keys") - col("shared_keys")).as("orphan_keys"),
            (col("shared_keys").cast("double") /
              col("child_keys").cast("double")).as("inclusion"),
            (col("shared_keys") === col("child_keys")).as("fk_like"))
      }.reduce(_ unionAll _).orderBy("candidate")
    },
    Some(fkCandidates.map { case (label, ct, cc, pt, pc) =>
      s"""SELECT '$label' AS candidate,
         |  (SELECT COUNT(DISTINCT $cc) FROM $ct WHERE $cc IS NOT NULL) AS child_keys,
         |  (SELECT COUNT(DISTINCT $pc) FROM $pt WHERE $pc IS NOT NULL) AS parent_keys,
         |  (SELECT COUNT(*) FROM (SELECT DISTINCT $cc FROM $ct WHERE $cc IS NOT NULL) c
         |     WHERE c.$cc IN (SELECT $pc FROM $pt)) AS shared_keys,
         |  (SELECT COUNT(DISTINCT $cc) FROM $ct WHERE $cc IS NOT NULL)
         |    - (SELECT COUNT(*) FROM (SELECT DISTINCT $cc FROM $ct WHERE $cc IS NOT NULL) c
         |       WHERE c.$cc IN (SELECT $pc FROM $pt)) AS orphan_keys,
         |  CAST((SELECT COUNT(*) FROM (SELECT DISTINCT $cc FROM $ct WHERE $cc IS NOT NULL) c
         |        WHERE c.$cc IN (SELECT $pc FROM $pt)) AS DOUBLE)
         |    / CAST((SELECT COUNT(DISTINCT $cc) FROM $ct WHERE $cc IS NOT NULL) AS DOUBLE) AS inclusion,
         |  (SELECT COUNT(*) FROM (SELECT DISTINCT $cc FROM $ct WHERE $cc IS NOT NULL) c
         |     WHERE c.$cc IN (SELECT $pc FROM $pt))
         |    = (SELECT COUNT(DISTINCT $cc) FROM $ct WHERE $cc IS NOT NULL) AS fk_like""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY candidate"))
  )

  /** Q193 — the TPC-H Q1 pricing summary: the canonical wide-aggregate
    * scan (eight aggregates over two grouping columns, one pass, no
    * join) — THE reference workload for scan + map-side partial
    * aggregation throughput. Charge = price·(1−disc)·(1+tax) stays in
    * exact decimal ((12,4)×(8,4)×(8,4) → scale 12, precision ≤ 32,
    * clamped once at the boundary); averages are exact-sum / count in
    * double (q11's davg device).
    */
  val q193 = Query(
    "q193_pricing_summary",
    (s, dir) => {
      val one = lit(1).cast("decimal(8,4)")
      val disc = col("l_discount").cast("decimal(8,4)")
      val tax = col("l_tax").cast("decimal(8,4)")
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          outD(round(sum(dec12(col("l_extendedprice")) * (one - disc)), 4))
            .as("sum_disc_price"),
          outD(round(sum(dec12(col("l_extendedprice")) * (one - disc) *
            (one + tax)), 4)).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
           |  CAST(CAST(round(SUM(CAST(l_quantity AS DECIMAL(18,4))), 4) AS DECIMAL(18,4)) AS DOUBLE) AS sum_qty,
           |  CAST(CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 4) AS DECIMAL(18,4)) AS DOUBLE) AS sum_base_price,
           |  CAST(CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) *
           |       (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))), 4) AS DECIMAL(18,4)) AS DOUBLE) AS sum_disc_price,
           |  CAST(CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) *
           |       (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4))) *
           |       (CAST(1 AS DECIMAL(8,4)) + CAST(l_tax AS DECIMAL(8,4)))), 4) AS DECIMAL(18,4)) AS DOUBLE) AS sum_charge,
           |  CAST(CAST(round(SUM(CAST(l_quantity AS DECIMAL(18,4))), 4) AS DECIMAL(18,4)) AS DOUBLE) / COUNT(*) AS avg_qty,
           |  CAST(CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 4) AS DECIMAL(18,4)) AS DOUBLE) / COUNT(*) AS avg_price,
           |  CAST(CAST(round(SUM(CAST(l_discount AS DECIMAL(18,4))), 4) AS DECIMAL(18,4)) AS DOUBLE) / COUNT(*) AS avg_disc,
           |  COUNT(*) AS count_order
           |FROM lineitem
           |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  )

  /** Q194 — the TPC-H Q3 shipping-priority shape: top-10 highest-value
    * orders in one market segment, ordered before a cutoff and shipped
    * after it — the selective-filter three-way join into a ranked
    * top-k that every planner benchmark leads with. Both date
    * predicates are pushed to their scans; the top-10 is a
    * TakeOrdered with the order key breaking revenue ties.
    */
  val q194 = Query(
    "q194_shipping_priority",
    (s, dir) => {
      val one = lit(1).cast("decimal(8,4)")
      Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
        .join(Tables.orders(s, dir)
            .filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
            .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"),
          col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, dir)
            .filter(col("l_shipdate") > lit("1997-01-01").cast("timestamp"))
            .select("l_orderkey", "l_extendedprice", "l_discount"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"),
          col("o_orderdate").cast("date").as("o_date"),
          col("o_orderpriority"))
        .agg(outD(round(sum(dec12(col("l_extendedprice")) *
          (one - col("l_discount").cast("decimal(8,4)"))), 4)).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey").asc)
        .limit(10)
    },
    Some("""SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_date, o_orderpriority,
           |  CAST(CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) *
           |       (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))), 4)
           |       AS DECIMAL(18,4)) AS DOUBLE) AS revenue
           |FROM customer
           |JOIN orders   ON c_custkey = o_custkey
           |JOIN lineitem ON o_orderkey = l_orderkey
           |WHERE c_mktsegment = 'BUILDING'
           |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
           |  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
           |GROUP BY 1, 2, 3
           |ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""".stripMargin)
  )

  val all: Seq[Query] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q12b, q13a, q13b, q14, q15, q16, q17, q25, q26, q84, q101,
    q147, q182, q183, q184, q192, q193, q194)
}
