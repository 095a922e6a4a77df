package graft.operators

import graft.{Canon, Query, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators: range join, as-of join, tumbling/sliding/session
  * windows (SURVEY.md §2.2 Q18–Q21) — the batch restatement of the
  * reference's stream semantics (bounded buffers + rate-limited emit,
  * StreamGeneratorThread.java:76-84).
  *
  * All event-time logic runs on second-truncated timestamps (`tss`):
  * the parquet fixture stores ns, Spark reads µs, DuckDB keeps ns —
  * truncation makes both engines see identical instants (SURVEY.md §7.4).
  */
object TemporalOps {
  import Canon._

  /** `ts` arrives as epoch-nanos LongType (see [[Tables.events]]);
    * derive epoch-seconds (`es`) and a naive-UTC second-truncated
    * timestamp (`tss`, TIMESTAMP_NTZ to match how both engines see the
    * other naive columns). */
  private[operators] def eventsTss(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("es", expr("ts div 1000000000"))
      .withColumn("tss", timestamp_seconds(col("es")).cast("timestamp_ntz"))

  /** Q18 — range self-join: event pairs of the same user within 5
    * minutes.
    *
    * Scale design: a naive `t2.ts BETWEEN t1.ts AND t1.ts + 5m` range
    * predicate on top of the user-key equi-join degrades to a per-user
    * cross product. Instead we bucket time into 300 s cells and join on
    * (user_id, bucket): the probe side expands to its 2 candidate cells,
    * so the join stays a pure equi hash/SMJ join and each qualifying
    * pair is found exactly once (the build row lives in exactly one
    * cell). This is the plan that survives 100 TB; the oracle states the
    * same semantics as a plain range join.
    */
  val q18 = Query(
    "q18_range_join",
    (s, dir) => {
      val e1 = eventsTss(s, dir)
        .select(col("event_id").as("a_id"), col("user_id"), col("es").as("a_es"))
      val e2 = eventsTss(s, dir)
        .select(col("event_id").as("b_id"), col("user_id"), col("es").as("b_es"),
          floor(col("es") / 300).as("bucket"))
      val probe = e1
        .withColumn("k", explode(array(lit(0L), lit(1L))))
        .withColumn("bucket", floor(col("a_es") / 300) + col("k"))
      probe.join(e2, Seq("user_id", "bucket"))
        .filter(col("b_es") >= col("a_es") &&
          col("b_es") <= col("a_es") + 300 &&
          col("a_id") =!= col("b_id"))
        .select(col("a_id"), col("b_id"), col("user_id"),
          (col("b_es") - col("a_es")).as("gap_s"))
        .orderBy("a_id", "b_id")
    },
    Some("""SELECT e1.event_id AS a_id, e2.event_id AS b_id, e1.user_id,
           |  CAST(epoch(date_trunc('second', e2.ts)) AS BIGINT)
           |    - CAST(epoch(date_trunc('second', e1.ts)) AS BIGINT) AS gap_s
           |FROM events e1 JOIN events e2
           |  ON e1.user_id = e2.user_id
           | AND date_trunc('second', e2.ts) >= date_trunc('second', e1.ts)
           | AND date_trunc('second', e2.ts) <= date_trunc('second', e1.ts) + INTERVAL 5 MINUTE
           | AND e1.event_id <> e2.event_id
           |ORDER BY a_id, b_id""".stripMargin)
  )

  /** Q19 — as-of join: each event paired with the latest order of the
    * same key at-or-before the event time. Implemented as equi-join +
    * per-event row_number (the portable pattern); at cluster scale the
    * same plan is a shuffle on the key followed by a bounded per-key
    * sort, and AQE handles key skew.
    */
  val q19 = Query(
    "q19_asof_join",
    (s, dir) => {
      val ev = eventsTss(s, dir).select("event_id", "user_id", "tss")
      val od = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderdate"))
      val w = Window.partitionBy("event_id")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      ev.join(od, col("user_id") === col("o_custkey") &&
          col("o_orderdate") <= col("tss"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("event_id"), col("user_id"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("asof_date"), col("o_totalprice"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, o_orderkey,
           |       CAST(o_orderdate AS DATE) AS asof_date, o_totalprice
           |FROM (
           |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           |         row_number() OVER (PARTITION BY e.event_id
           |                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
           |  FROM events e JOIN orders o
           |    ON e.user_id = o.o_custkey
           |   AND o.o_orderdate <= date_trunc('second', e.ts)) t
           |WHERE rn = 1
           |ORDER BY event_id""".stripMargin)
  )

  /** Q19d — FORWARD as-of join: each event matched to the same user's
    * NEXT event (strictly later in (ts, event_id) order) — the "next
    * state change" lookup that fills the gap left by q19's backward
    * direction; together they are the full as-of surface kdb/Flink
    * expose. Self-join form because the fixture's only key shared
    * across time-overlapping tables is the events stream itself
    * (orders end 2001, events start 2024 — an events→orders forward
    * as-of is vacuously empty at every SF). Declarative lead() would
    * express this too; the join-then-rank shape is kept deliberately so
    * the oracle validates general forward-as-of semantics, not the
    * window shortcut. */
  val q19d = Query(
    "q19d_asof_forward",
    (s, dir) => {
      val ev = eventsTss(s, dir)
        .withColumn("es", unix_timestamp(col("tss")))
        .select("event_id", "user_id", "es")
      val l = ev.select(col("event_id").as("a_id"), col("user_id"),
        col("es").as("a_es"))
      val r = ev.select(col("event_id").as("b_id"),
        col("user_id").as("b_user"), col("es").as("b_es"))
      val w = Window.partitionBy("a_id")
        .orderBy(col("b_es").asc, col("b_id").asc)
      l.join(r, col("user_id") === col("b_user") &&
          (col("b_es") > col("a_es") ||
            (col("b_es") === col("a_es") && col("b_id") > col("a_id"))))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("a_id").as("event_id"), col("user_id"),
          col("b_id").as("next_event_id"),
          (col("b_es") - col("a_es")).as("gap_s"))
        .orderBy("event_id")
    },
    Some("""WITH e AS (
           |  SELECT event_id, user_id,
           |         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es
           |  FROM events)
           |SELECT event_id, user_id, next_event_id, gap_s
           |FROM (
           |  SELECT a.event_id, a.user_id, b.event_id AS next_event_id,
           |         b.es - a.es AS gap_s,
           |         row_number() OVER (PARTITION BY a.event_id
           |                            ORDER BY b.es ASC, b.event_id ASC) AS rn
           |  FROM e a JOIN e b
           |    ON a.user_id = b.user_id
           |   AND (b.es > a.es OR (b.es = a.es AND b.event_id > a.event_id))) t
           |WHERE rn = 1
           |ORDER BY event_id""".stripMargin)
  )

  /** Q19b — the SAME as-of join executed by the engine's native
    * whole-operator plan ([[graft.plans.AsOfJoinExec]]): one shuffle
    * per side + in-partition sort + streaming merge, instead of the
    * composed join-then-rank (which materializes every order
    * at-or-before every event and re-shuffles on event_id). The oracle
    * is identical to q19's — the custom operator must be row-for-row
    * indistinguishable from the composed plan.
    */
  val q19b = Query(
    "q19b_asof_native",
    (s, dir) => {
      val ev = eventsTss(s, dir).select("event_id", "user_id", "tss")
      val od = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderdate").cast("timestamp_ntz").as("o_odate"))
      graft.plans.AsOfOps.asofJoin(
          ev, od,
          leftKey = ev("user_id"), rightKey = od("o_custkey"),
          leftTime = ev("tss"), rightTime = od("o_odate"),
          rightTieBreak = Seq(od("o_orderkey")))
        .select(col("event_id"), col("user_id"), col("o_orderkey"),
          col("o_odate").cast("date").as("asof_date"), col("o_totalprice"))
        .orderBy("event_id")
    },
    q19.oracle
  )

  /** Q19c — LEFT-OUTER native as-of: events matched to the latest
    * URGENT order at-or-before their time; users with no qualifying
    * order history survive null-filled (the pandas merge_asof default —
    * restricting the right side is what makes unmatched rows actually
    * occur). Same operator, `outer = true`. */
  val q19c = Query(
    "q19c_asof_outer",
    (s, dir) => {
      val ev = eventsTss(s, dir).select("event_id", "user_id", "tss")
      val od = Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderdate").cast("timestamp_ntz").as("o_odate"))
      graft.plans.AsOfOps.asofJoin(
          ev, od,
          leftKey = ev("user_id"), rightKey = od("o_custkey"),
          leftTime = ev("tss"), rightTime = od("o_odate"),
          rightTieBreak = Seq(od("o_orderkey")), outer = true)
        .select(col("event_id"), col("user_id"), col("o_orderkey"),
          col("o_odate").cast("date").as("asof_date"), col("o_totalprice"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, o_orderkey,
           |       CAST(o_orderdate AS DATE) AS asof_date, o_totalprice
           |FROM (
           |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           |         row_number() OVER (PARTITION BY e.event_id
           |                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
           |  FROM events e LEFT JOIN (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
           |    ON e.user_id = o.o_custkey
           |   AND o.o_orderdate <= date_trunc('second', e.ts)) t
           |WHERE rn = 1
           |ORDER BY event_id""".stripMargin)
  )

  /** Q20a — tumbling 1 h window aggregate per event type. */
  val q20a = Query(
    "q20a_tumbling_window",
    (s, dir) =>
      eventsTss(s, dir)
        .groupBy(window(col("tss"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("window.start").as("ws"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy("ws", "event_type"),
    Some("""SELECT CAST(to_timestamp(CAST(floor(epoch(date_trunc('second', ts)) / 3600) * 3600 AS BIGINT)) AS TIMESTAMP) AS ws,
           |       event_type, COUNT(*) AS n,
           |       CAST(CAST(round(SUM(CAST(value AS DECIMAL(18,4))), 4) AS DECIMAL(18,4)) AS DOUBLE) AS sum_value
           |FROM events
           |GROUP BY 1, 2
           |ORDER BY ws, event_type""".stripMargin)
  )

  /** Q20b — sliding window (1 h length, 30 min slide): each event lands
    * in exactly 2 windows. The oracle materializes the two window
    * assignments explicitly.
    */
  val q20b = Query(
    "q20b_sliding_window",
    (s, dir) =>
      eventsTss(s, dir)
        .groupBy(window(col("tss"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("window.start").as("ws"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy("ws", "event_type"),
    Some("""SELECT CAST(to_timestamp(CAST(floor(epoch(date_trunc('second', ts)) / 1800) * 1800 - k * 1800 AS BIGINT)) AS TIMESTAMP) AS ws,
           |       event_type, COUNT(*) AS n,
           |       CAST(CAST(round(SUM(CAST(value AS DECIMAL(18,4))), 4) AS DECIMAL(18,4)) AS DOUBLE) AS sum_value
           |FROM events, (SELECT unnest([0, 1]) AS k) offs
           |GROUP BY 1, 2
           |ORDER BY ws, event_type""".stripMargin)
  )

  /** Q21 — session windows per user (30 min inactivity gap). Spark's
    * `session_window` keeps an event in the session when the gap is
    * EXACTLY the duration and only starts a new one when gap > duration
    * (verified against the one exact-1800 s gap in the sf0.1 events);
    * the oracle replicates that with the classic gaps-and-islands
    * construction using a strict `> 1800` split.
    */
  val q21 = Query(
    "q21_session_window",
    (s, dir) =>
      eventsTss(s, dir)
        .groupBy(session_window(col("tss"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "session_start"),
    Some("""WITH e AS (
           |  SELECT user_id, date_trunc('second', ts) AS tss, value,
           |         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es
           |  FROM events),
           |marked AS (
           |  SELECT *, CASE WHEN es - lag(es) OVER (PARTITION BY user_id ORDER BY es, value) > 1800
           |                 OR lag(es) OVER (PARTITION BY user_id ORDER BY es, value) IS NULL
           |            THEN 1 ELSE 0 END AS new_session
           |  FROM e),
           |sessions AS (
           |  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY es, value
           |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           |  FROM marked)
           |SELECT user_id, MIN(tss) AS session_start,
           |       MAX(tss) + INTERVAL 30 MINUTE AS session_end,
           |       COUNT(*) AS n_events,
           |       CAST(CAST(round(SUM(CAST(value AS DECIMAL(18,4))), 4) AS DECIMAL(18,4)) AS DOUBLE) AS sum_value
           |FROM sessions
           |GROUP BY user_id, sid
           |ORDER BY user_id, session_start""".stripMargin)
  )

  /** Q22 — JSON property extraction from the semi-structured
    * `events.props` column (multimodal-column mandate). */
  val q22 = Query(
    "q22_json_extract",
    (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(sum(col("k")).as("sum_k"),
          count(col("k")).as("n_k"),
          max(col("k")).as("max_k"))
        .orderBy("event_type"),
    Some("""SELECT event_type,
           |       CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           |       COUNT(CAST(props->>'$.k' AS BIGINT)) AS n_k,
           |       MAX(CAST(props->>'$.k' AS BIGINT)) AS max_k
           |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
  )

  /** Q71 — typed JSON parsing (`from_json` with a pinned schema): the
    * streaming-ingest form of Q22's path extraction — one parse per row
    * into a struct, then typed field access; malformed rows become
    * nulls instead of failures (PERMISSIVE mode), counted in the
    * output. */
  val q71 = Query(
    "q71_from_json",
    (s, dir) => {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType)))
      Tables.events(s, dir)
        .withColumn("p", from_json(col("props"), schema))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          count(col("p.k")).as("n_parsed"),
          sum(col("p.k")).as("sum_k"),
          min(col("p.k")).as("min_k"),
          max(col("p.k")).as("max_k"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, COUNT(*) AS n,
           |       COUNT(CAST(props->>'$.k' AS BIGINT)) AS n_parsed,
           |       CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           |       MIN(CAST(props->>'$.k' AS BIGINT)) AS min_k,
           |       MAX(CAST(props->>'$.k' AS BIGINT)) AS max_k
           |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
  )

  /** Q72 — SCD Type-2 dimension history: the reference's master-data
    * upserts (`ON DUPLICATE KEY UPDATE`, createDW.sql:12-16,99-102)
    * overwrite in place — Type 1, history lost. This is the Type-2
    * restatement over the events stream: per user, each run of
    * consecutive identical `event_type` states becomes one versioned
    * dimension row with `[valid_from, valid_to)` seconds and an
    * `is_current` flag on the open row.
    *
    * Plan shape: two per-user windows (lag → change flag, running sum →
    * version id) + one groupBy + one lead over versions. Every window
    * partitions by `user_id`, so the whole build is ONE shuffle on the
    * dimension's natural key; per-user sorts are bounded by per-key
    * event counts, which is the same bound any SCD2 build needs at
    * 100 TB. Ties within a second are broken by `event_id` (unique) so
    * both engines see one deterministic state sequence.
    */
  /** The SCD2 dimension of q72, reusable: one row per (user, state run)
    * with [valid_from, valid_to) second-epoch validity. Shared by q72
    * (the history itself) and q107 (point-in-time lookups against it). */
  private[graft] def scd2Dim(s: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy("es", "event_id")
    val wRun = Window.partitionBy("user_id").orderBy("es", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wVer = Window.partitionBy("user_id").orderBy("version")
    eventsTss(s, dir)
      .select(col("user_id"), col("event_id"), col("es"), col("event_type"))
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(wOrd).isNull ||
          lag(col("event_type"), 1).over(wOrd) =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("version", sum(col("chg")).over(wRun))
      .groupBy(col("user_id"), col("version"))
      .agg(min(col("event_type")).as("state"),
        min(col("es")).as("valid_from"),
        count(lit(1)).as("n_events"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wVer))
      .withColumn("is_current", col("valid_to").isNull)
      .select("user_id", "version", "state", "valid_from", "valid_to",
        "n_events", "is_current")
  }

  /** The q72 dim as DuckDB CTEs (ending in a `dim2` relation) — shared
    * verbatim by the q72 and q107 oracles so they can never drift. */
  private val scd2DimSql =
    """e AS (
      |  SELECT user_id, event_id, event_type,
      |         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es
      |  FROM events),
      |flagged AS (
      |  SELECT *, CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
      |                 THEN 1 ELSE 0 END AS chg
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)),
      |runs AS (
      |  SELECT *, CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY es, event_id
      |                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
      |  FROM flagged),
      |dim AS (
      |  SELECT user_id, version, MIN(event_type) AS state,
      |         MIN(es) AS valid_from, COUNT(*) AS n_events
      |  FROM runs GROUP BY user_id, version),
      |dim2 AS (
      |  SELECT user_id, version, state, valid_from,
      |         lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) AS valid_to,
      |         n_events
      |  FROM dim)""".stripMargin

  val q72 = Query(
    "q72_scd2",
    (s, dir) => scd2Dim(s, dir).orderBy("user_id", "version"),
    Some(s"""WITH $scd2DimSql
            |SELECT user_id, version, state, valid_from, valid_to, n_events,
            |       valid_to IS NULL AS is_current
            |FROM dim2 ORDER BY user_id, version""".stripMargin)
  )

  /** Q107 — point-in-time (as-at) lookup against the q72 SCD2 dimension:
    * for every purchase event, the state the user was in ONE HOUR
    * before the purchase — the canonical SCD2 consumption pattern
    * ("join the fact to the dimension version valid at transaction
    * time"; a Type-1 dim answers only "current state"). Lookups that
    * precede the user's first version resolve to null (declared).
    *
    * Scale shape: equi-join on user_id with a residual validity range
    * predicate; per-user version counts are bounded (change-count),
    * so the residual filter is cheap. One co-partitioned shuffle on
    * the dim build's own key — no extra exchange for the join.
    */
  val q107 = Query(
    "q107_scd2_lookup",
    (s, dir) => {
      val dim = scd2Dim(s, dir)
        .select(col("user_id"), col("version"), col("state"),
          col("valid_from"), col("valid_to"))
      val purchases = eventsTss(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("es"),
          (col("es") - 3600L).as("t"))
      purchases.join(dim,
          purchases("user_id") === dim("user_id") &&
            col("valid_from") <= col("t") &&
            (col("valid_to").isNull || col("valid_to") > col("t")),
          "left")
        .select(col("event_id"), purchases("user_id"), col("es"), col("t"),
          col("version"), col("state"))
        .orderBy("event_id")
    },
    Some(s"""WITH $scd2DimSql,
            |p AS (
            |  SELECT event_id, user_id,
            |         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es,
            |         CAST(epoch(date_trunc('second', ts)) AS BIGINT) - 3600 AS t
            |  FROM events WHERE event_type = 'purchase')
            |SELECT p.event_id, p.user_id, p.es, p.t, d.version, d.state
            |FROM p LEFT JOIN dim2 d
            |  ON p.user_id = d.user_id AND d.valid_from <= p.t
            |     AND (d.valid_to IS NULL OR d.valid_to > p.t)
            |ORDER BY p.event_id""".stripMargin)
  )

  /** Q76 — rolling per-key time-series features: for each event, the
    * mean and max of `value` over the user's last 5 events (current row
    * inclusive) plus the seconds since the previous event — the
    * sliding-window feature block of any sessionized training set.
    *
    * The rolling mean is built from an exact BIGINT cents sum
    * (`round(value*100)`) so the frame aggregation is order- and
    * algorithm-independent — engines differ in how they slide frames
    * (recompute vs retract) but integer addition cannot drift. Frames
    * are ROWS-bounded (≤5 rows) per user: one shuffle on `user_id`,
    * per-key bounded sort, no global sort until the output order-by.
    */
  val q76 = Query(
    "q76_rolling_features",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("es", "event_id")
      val w5 = w.rowsBetween(-4, Window.currentRow)
      eventsTss(s, dir)
        .withColumn("v100", round(col("value") * 100, 0).cast("long"))
        .withColumn("roll_n", count(lit(1)).over(w5))
        .withColumn("roll_avg",
          round(sum(col("v100")).over(w5).cast("double")
            / col("roll_n").cast("double") / 100d, 6))
        .withColumn("roll_max", max(col("value")).over(w5))
        .withColumn("gap_s", col("es") - lag(col("es"), 1).over(w))
        .select(col("event_id"), col("user_id"), col("value"),
          col("roll_n"), col("roll_avg"), col("roll_max"), col("gap_s"))
        .orderBy("event_id")
    },
    Some("""WITH e AS (
           |  SELECT event_id, user_id, value,
           |         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es,
           |         CAST(round(value * 100, 0) AS BIGINT) AS v100
           |  FROM events)
           |SELECT event_id, user_id, value,
           |       COUNT(*) OVER w5 AS roll_n,
           |       round(CAST(SUM(v100) OVER w5 AS DOUBLE)
           |             / CAST(COUNT(*) OVER w5 AS DOUBLE) / 100, 6) AS roll_avg,
           |       MAX(value) OVER w5 AS roll_max,
           |       es - lag(es) OVER (PARTITION BY user_id ORDER BY es, event_id) AS gap_s
           |FROM e
           |WINDOW w5 AS (PARTITION BY user_id ORDER BY es, event_id
           |              ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
           |ORDER BY event_id""".stripMargin)
  )

  /** Q87 — time-windowed event dedup: keep the first event of each
    * 86400 s-gap burst per (user, event_type) — the "session-leader"
    * throttle every event pipeline runs on beacon/retry spam (one-day
    * gap: drops 36% of fixture events). An event survives iff it has no
    * same-key predecessor within a day, i.e. it opens a session under
    * the q21 `session_window` gap rule.
    *
    * Scale shape: ONE shuffle on (user_id, event_type) + a lag window —
    * per-key state is a single previous timestamp, so the window sort is
    * the only per-key cost and the plan is identical at any scale. The
    * streaming restatement is `dropDuplicatesWithinWatermark` /
    * `sessionize` in [[graft.streaming.StreamingPipeline]].
    */
  val q87 = Query(
    "q87_dedup_window",
    (s, dir) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy("es", "event_id")
      eventsTss(s, dir)
        .withColumn("prev", lag(col("es"), 1).over(w))
        .filter(col("prev").isNull || col("es") - col("prev") > 86400)
        .select(col("event_id"), col("user_id"), col("event_type"), col("es"))
        .orderBy("event_id")
    },
    Some("""WITH e AS (
           |  SELECT event_id, user_id, event_type,
           |         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es
           |  FROM events),
           |l AS (
           |  SELECT *, lag(es) OVER (PARTITION BY user_id, event_type
           |                          ORDER BY es, event_id) AS prev
           |  FROM e)
           |SELECT event_id, user_id, event_type, es FROM l
           |WHERE prev IS NULL OR es - prev > 86400
           |ORDER BY event_id""".stripMargin)
  )

  /** Q94 — the native per-key top-k plan ([[graft.plans.TopKOps]]):
    * the 20 highest-value events per event type, executed as
    * PARTIAL (map-side bounded heaps) + FINAL (streaming rank) instead
    * of the window path that shuffles and buffers every row of every
    * group. The oracle is the plain `row_number()` formulation — the
    * native plan must be row-for-row indistinguishable from it.
    */
  val q94 = Query(
    "q94_topk_native",
    (s, dir) => {
      val ev = eventsTss(s, dir)
        .select(col("event_id"), col("event_type"), col("value"))
      graft.plans.TopKOps.topKPerKey(
        ev,
        keys = Seq(ev("event_type")),
        order = Seq(ev("value").desc, ev("event_id").asc),
        k = 20)
        .orderBy("event_type", "rank")
    },
    Some("""SELECT event_id, event_type, value,
           |       CAST(row_number() OVER w AS BIGINT) AS rank
           |FROM events
           |WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id ASC)
           |QUALIFY row_number() OVER w <= 20
           |ORDER BY event_type, rank""".stripMargin)
  )

  /** Q97 — time-series regularization: resample each user's event
    * stream onto an hourly grid and linearly interpolate the gaps —
    * the gap-fill step feature pipelines run before any fixed-step
    * model. Grid endpoints are each user's first/last observed hour,
    * so every grid point has a neighbor on both sides and
    * interpolation is total.
    *
    * Cross-engine exactness: hourly means are exact decimal sums
    * divided in double and rounded to 6 decimals; the interpolation
    * `prev + (next-prev) * (h-ph)/(nh-ph)` is evaluated with the same
    * AST shape in both engines over those already-rounded doubles and
    * exact integer hour distances — bit-identical IEEE arithmetic, so
    * it is deliberately NOT re-rounded (a final round(·,6) hit a
    * half-way boundary at sf0.001 where the engines' double-rounding
    * directions differ).
    *
    * Scale shape: one combinable aggregate keyed (user_id, hour); the
    * spine is generated map-side from a per-user min/max (`sequence`
    * explode — fan-out bounded by the observed time span); prev/next
    * carries are two frames over the same (user_id, hour) sort — AQE
    * sees one shuffle key throughout, no broadcast, no driver state.
    */
  val q97 = Query(
    "q97_interpolate",
    (s, dir) => {
      val obs = eventsTss(s, dir)
        .withColumn("h", (col("es") / 3600).cast("long") * 3600)
        .groupBy(col("user_id"), col("h"))
        .agg(round(Canon.dsum(col("value")) / count(lit(1)).cast("double"), 6)
          .as("obs_val"))
      val spine = obs.groupBy("user_id")
        .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
        .select(col("user_id"),
          explode(sequence(col("h0"), col("h1"), lit(3600L))).as("h"))
      val wUp = Window.partitionBy("user_id").orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // the forward carry runs on a DESCENDING growing frame: Spark's
      // [currentRow, unboundedFollowing] frame re-evaluates the whole
      // remainder per row (O(n^2) per partition — 44 s at sf0.1 for
      // this query); a desc-ordered [unboundedPreceding, currentRow]
      // frame computes the same value incrementally (1.3 s). Same
      // shuffle key, one extra in-partition sort.
      val wDown = Window.partitionBy("user_id").orderBy(col("h").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(obs, Seq("user_id", "h"), "left")
        .withColumn("pv", last(col("obs_val"), ignoreNulls = true).over(wUp))
        .withColumn("ph",
          last(when(col("obs_val").isNotNull, col("h")), ignoreNulls = true).over(wUp))
        .withColumn("nv", last(col("obs_val"), ignoreNulls = true).over(wDown))
        .withColumn("nh",
          last(when(col("obs_val").isNotNull, col("h")), ignoreNulls = true).over(wDown))
        .select(
          col("user_id"),
          timestamp_seconds(col("h")).cast("timestamp_ntz").as("hour"),
          when(col("obs_val").isNotNull, col("obs_val"))
            .otherwise(
              col("pv") + (col("nv") - col("pv")) *
                ((col("h") - col("ph")).cast("double") /
                  (col("nh") - col("ph")).cast("double")))
            .as("value"),
          col("obs_val").isNotNull.as("is_obs"))
        .orderBy("user_id", "hour")
    },
    Some("""WITH obs AS (
           |  SELECT user_id,
           |         CAST(floor(epoch(date_trunc('second', ts)) / 3600) * 3600 AS BIGINT) AS h,
           |         round(CAST(CAST(round(SUM(CAST(value AS DECIMAL(18,4))), 4) AS DECIMAL(18,4)) AS DOUBLE)
           |               / CAST(COUNT(*) AS DOUBLE), 6) AS obs_val
           |  FROM events GROUP BY 1, 2),
           |spine AS (
           |  SELECT user_id, unnest(generate_series(min(h), max(h), 3600)) AS h
           |  FROM obs GROUP BY user_id),
           |g AS (
           |  SELECT s.user_id, s.h, o.obs_val,
           |         last_value(o.obs_val IGNORE NULLS) OVER wu AS pv,
           |         last_value(CASE WHEN o.obs_val IS NOT NULL THEN s.h END IGNORE NULLS) OVER wu AS ph,
           |         first_value(o.obs_val IGNORE NULLS) OVER wd AS nv,
           |         first_value(CASE WHEN o.obs_val IS NOT NULL THEN s.h END IGNORE NULLS) OVER wd AS nh
           |  FROM spine s LEFT JOIN obs o USING (user_id, h)
           |  WINDOW wu AS (PARTITION BY s.user_id ORDER BY s.h
           |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           |         wd AS (PARTITION BY s.user_id ORDER BY s.h
           |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
           |SELECT user_id, CAST(to_timestamp(h) AS TIMESTAMP) AS hour,
           |       CASE WHEN obs_val IS NOT NULL THEN obs_val
           |            ELSE pv + (nv - pv) *
           |                 (CAST(h - ph AS DOUBLE) / CAST(nh - ph AS DOUBLE)) END AS value,
           |       obs_val IS NOT NULL AS is_obs
           |FROM g ORDER BY user_id, hour""".stripMargin)
  )

  /** Q99 — ordered funnel analysis (view → click → purchase), the
    * "analysis of customer shopping behavior" the reference's README
    * declares as its purpose (README.md:6) but never implements: for
    * each user, the first view, the first click within ONE HOUR after
    * that view, the first purchase within one hour after that click;
    * then the per-stage user counts and conversion rates. The bounded
    * conversion window is what makes a funnel a funnel — without it
    * every long-lived user trivially "converts".
    *
    * Event-time comparisons run on second-truncated epochs (the
    * fixture's cross-engine timestamp rule); "after" is strictly-later-
    * second, declared semantics.
    *
    * Scale shape: three conditional-min aggregates, each keyed
    * user_id — the join between stages stays on the same shuffle key
    * throughout (co-partitioned, no broadcast of user-sized state),
    * then a constant-sized verdict rollup.
    */
  val q99 = Query(
    "q99_funnel",
    (s, dir) => {
      val ev = eventsTss(s, dir).select("user_id", "event_type", "es")
      val t1 = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("es")).as("t1"))
      val t2 = ev.filter(col("event_type") === "click")
        .join(t1, "user_id")
        .filter(col("es") > col("t1") && col("es") <= col("t1") + 3600L)
        .groupBy("user_id").agg(min(col("es")).as("t2"))
      val t3 = ev.filter(col("event_type") === "purchase")
        .join(t2, "user_id")
        .filter(col("es") > col("t2") && col("es") <= col("t2") + 3600L)
        .groupBy("user_id").agg(min(col("es")).as("t3"))
      val stages = t1
        .join(t2.select(col("user_id"), lit(1).as("s2")), Seq("user_id"), "left")
        .join(t3.select(col("user_id"), lit(1).as("s3")), Seq("user_id"), "left")
        .select(col("user_id"),
          (lit(1L) + coalesce(col("s2"), lit(0)) + coalesce(col("s3"), lit(0)))
            .cast("long").as("stage"))
      val tot = stages.agg(count(lit(1)).cast("double").as("tot"))
      stages.groupBy("stage")
        .agg(count(lit(1)).as("n_users"))
        .crossJoin(broadcast(tot))
        .select(col("stage"), col("n_users"),
          (col("n_users").cast("double") / col("tot")).as("rate"))
        .orderBy("stage")
    },
    Some("""WITH ev AS (
           |  SELECT user_id, event_type,
           |         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es
           |  FROM events),
           |t1 AS (SELECT user_id, MIN(es) AS t1 FROM ev
           |       WHERE event_type = 'view' GROUP BY user_id),
           |t2 AS (SELECT e.user_id, MIN(es) AS t2 FROM ev e JOIN t1 USING (user_id)
           |       WHERE event_type = 'click' AND es > t1 AND es <= t1 + 3600
           |       GROUP BY e.user_id),
           |t3 AS (SELECT e.user_id, MIN(es) AS t3 FROM ev e JOIN t2 USING (user_id)
           |       WHERE event_type = 'purchase' AND es > t2 AND es <= t2 + 3600
           |       GROUP BY e.user_id),
           |stages AS (
           |  SELECT t1.user_id,
           |         CAST(1 + (t2.user_id IS NOT NULL)::INT + (t3.user_id IS NOT NULL)::INT
           |              AS BIGINT) AS stage
           |  FROM t1 LEFT JOIN t2 ON t1.user_id = t2.user_id
           |          LEFT JOIN t3 ON t1.user_id = t3.user_id)
           |SELECT stage, COUNT(*) AS n_users,
           |       CAST(COUNT(*) AS DOUBLE) / (SELECT CAST(COUNT(*) AS DOUBLE) FROM stages) AS rate
           |FROM stages GROUP BY stage ORDER BY stage""".stripMargin)
  )

  /** Q100 — weekly cohort retention: users are cohorted by the epoch
    * week of their first event; each (cohort, week-offset) cell counts
    * the cohort members still active that week and the retention rate
    * against the cohort size. The other half of the behavior-analysis
    * mandate (q99 is conversion; this is retention).
    *
    * Scale shape: first-week per user is one keyed aggregate; activity
    * cells are a distinct-per-(user, week) aggregate joined back on
    * user_id (same shuffle key), then a (cohort, offset) rollup. Weeks
    * are integer epoch-week indices — no calendar arithmetic to drift
    * between engines.
    */
  val q100 = Query(
    "q100_cohort_retention",
    (s, dir) => {
      val wk = eventsTss(s, dir)
        .select(col("user_id"), (col("es") / 604800L).cast("long").as("wk"))
        .distinct()
      val cohort = wk.groupBy("user_id").agg(min(col("wk")).as("cw"))
      val sizes = cohort.groupBy("cw").agg(count(lit(1)).as("n_cohort"))
      wk.join(cohort, "user_id")
        .groupBy(col("cw"), (col("wk") - col("cw")).as("offset_w"))
        .agg(count(lit(1)).as("n_active"))
        .join(sizes, "cw")
        .select(col("cw").as("cohort_week"), col("offset_w"),
          col("n_active"), col("n_cohort"),
          (col("n_active").cast("double") / col("n_cohort").cast("double"))
            .as("retention"))
        .orderBy("cohort_week", "offset_w")
    },
    Some("""WITH wk AS (
           |  SELECT DISTINCT user_id,
           |         CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 604800 AS wk
           |  FROM events),
           |cohort AS (SELECT user_id, MIN(wk) AS cw FROM wk GROUP BY user_id),
           |sizes AS (SELECT cw, COUNT(*) AS n_cohort FROM cohort GROUP BY cw),
           |cells AS (
           |  SELECT c.cw, w.wk - c.cw AS offset_w, COUNT(*) AS n_active
           |  FROM wk w JOIN cohort c USING (user_id)
           |  GROUP BY c.cw, w.wk - c.cw)
           |SELECT cw AS cohort_week, offset_w, n_active, n_cohort,
           |       CAST(n_active AS DOUBLE) / CAST(n_cohort AS DOUBLE) AS retention
           |FROM cells JOIN sizes USING (cw)
           |ORDER BY cohort_week, offset_w""".stripMargin)
  )

  /** Q102 — event-transition matrix (first-order Markov model of user
    * behavior): for each user's event stream in (second, event_id)
    * order, count prev_type → type transitions and normalize per
    * source state. The third behavior-analytics view next to q99
    * (conversion) and q100 (retention) — "what do users do next".
    *
    * Scale shape: one lag window on the (user_id) shuffle + one
    * combinable (prev, next) aggregate; probabilities are exact double
    * divisions of exact counts.
    */
  val q102 = Query(
    "q102_markov_transitions",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("es", "event_id")
      val trans = eventsTss(s, dir)
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).as("n"))
      val w2 = Window.partitionBy("prev_type")
      trans
        .withColumn("p",
          col("n").cast("double") / sum(col("n")).over(w2).cast("double"))
        .orderBy("prev_type", "next_type")
    },
    Some("""WITH ev AS (
           |  SELECT user_id, event_id, event_type,
           |         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es
           |  FROM events),
           |tr AS (
           |  SELECT lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY es, event_id)
           |           AS prev_type,
           |         event_type AS next_type
           |  FROM ev),
           |counts AS (
           |  SELECT prev_type, next_type, COUNT(*) AS n
           |  FROM tr WHERE prev_type IS NOT NULL
           |  GROUP BY prev_type, next_type)
           |SELECT prev_type, next_type, n,
           |       CAST(n AS DOUBLE) /
           |         CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS p
           |FROM counts ORDER BY prev_type, next_type""".stripMargin)
  )

  /** Q110 — time-based RANGE window frames: for every event, the count
    * and exact decimal sum of the same user's events in the trailing
    * 10 minutes of EVENT TIME (`RANGE BETWEEN 600 PRECEDING AND
    * CURRENT ROW` over epoch seconds). Complements q15/q76's
    * ROWS-frame battery — a ROWS frame counts rows, a RANGE frame
    * spans value distance, which is what rate-limiting / trailing-load
    * features actually want. Same-second events share one frame value
    * by definition (RANGE includes peers — declared, and why the
    * output is keyed by event_id but ordered deterministically).
    *
    * Scale shape: one window over the (user_id) shuffle, frame bounded
    * by event density per 10 minutes; exact decimal sum re-clamped at
    * the output boundary.
    */
  val q110 = Query(
    "q110_range_frames",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("es")
        .rangeBetween(-600L, 0L)
      eventsTss(s, dir)
        .select(col("event_id"), col("user_id"), col("es"), col("value"))
        .withColumn("n_10m", count(lit(1)).over(w))
        .withColumn("sum_10m",
          Canon.outD(sum(Canon.dec(col("value"))).over(w)))
        .select("event_id", "user_id", "es", "n_10m", "sum_10m")
        .orderBy("event_id")
    },
    Some("""WITH e AS (
           |  SELECT event_id, user_id,
           |         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es, value
           |  FROM events)
           |SELECT event_id, user_id, es,
           |       COUNT(*) OVER w AS n_10m,
           |       CAST(CAST(round(SUM(CAST(value AS DECIMAL(18,4))) OVER w, 4)
           |            AS DECIMAL(18,4)) AS DOUBLE) AS sum_10m
           |FROM e
           |WINDOW w AS (PARTITION BY user_id ORDER BY es
           |             RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
           |ORDER BY event_id""".stripMargin)
  )

  /** Q112 — event-sequence pattern matching (the MATCH_RECOGNIZE
    * shape): each user's full event history becomes a compact code
    * string (v/c/p/s/e per event, deterministic (es, event_id) order)
    * and is matched against the regex `v[ce]*c[ce]*p` — "a view, then
    * a click, then a purchase, with only clicks/errors between". The
    * regex answers ORDERED containment, which q99's stage aggregates
    * (bounded-window semantics) and q102's adjacent transitions cannot
    * express.
    *
    * The per-user sequence is assembled with the deterministic
    * sort-struct-then-join collect (the q28 signature trick), never an
    * unordered collect_list. Sequence length is bounded by per-user
    * event counts — the same bound every sessionization op here
    * already carries; character classes behave identically in Java
    * regex and DuckDB's RE2 for this pattern.
    */
  val q112 = Query(
    "q112_sequence_match",
    (s, dir) => {
      val coded = eventsTss(s, dir)
        .select(col("user_id"), col("es"), col("event_id"),
          substring(col("event_type"), 1, 1).as("code"))
      coded
        .groupBy("user_id")
        .agg(
          array_join(
            transform(
              array_sort(collect_list(struct(col("es"), col("event_id"), col("code")))),
              x => x.getField("code")), "").as("seq"),
          count(lit(1)).as("n_events"))
        .withColumn("matched", col("seq").rlike("v[ce]*c[ce]*p"))
        .select("user_id", "n_events", "seq", "matched")
        .orderBy("user_id")
    },
    Some("""WITH coded AS (
           |  SELECT user_id, event_id,
           |         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es,
           |         substr(event_type, 1, 1) AS code
           |  FROM events)
           |SELECT user_id, COUNT(*) AS n_events,
           |       string_agg(code, '' ORDER BY es, event_id) AS seq,
           |       regexp_matches(string_agg(code, '' ORDER BY es, event_id),
           |                      'v[ce]*c[ce]*p') AS matched
           |FROM coded GROUP BY user_id ORDER BY user_id""".stripMargin)
  )

  /** Q113 — time-to-event with right-censoring (survival-analysis
    * prep): per user, the seconds from first signup to first
    * subsequent purchase; users who never purchase after signing up
    * are CENSORED at the corpus horizon (max event second) — the
    * censoring flag is what separates survival data from a plain
    * duration query, and dropping censored users (what a naive join
    * does) biases every downstream hazard estimate.
    *
    * Scale shape: two conditional-min aggregates co-partitioned on
    * user_id + one broadcast scalar horizon. Users with no signup are
    * out of scope by definition.
    */
  val q113 = Query(
    "q113_survival",
    (s, dir) => {
      val ev = eventsTss(s, dir).select("user_id", "event_type", "es")
      val horizon = ev.agg(max(col("es")).as("h"))
      val signup = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(col("es")).as("t0"))
      val purchase = ev.filter(col("event_type") === "purchase")
        .join(signup, "user_id")
        .filter(col("es") > col("t0"))
        .groupBy("user_id").agg(min(col("es")).as("t1"))
      signup.join(purchase, Seq("user_id"), "left")
        .crossJoin(broadcast(horizon))
        .select(col("user_id"), col("t0"),
          (coalesce(col("t1"), col("h")) - col("t0")).as("duration_s"),
          col("t1").isNull.as("censored"))
        .orderBy("user_id")
    },
    Some("""WITH ev AS (
           |  SELECT user_id, event_type,
           |         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es
           |  FROM events),
           |h AS (SELECT MAX(es) AS h FROM ev),
           |signup AS (SELECT user_id, MIN(es) AS t0 FROM ev
           |           WHERE event_type = 'signup' GROUP BY user_id),
           |purchase AS (
           |  SELECT e.user_id, MIN(es) AS t1 FROM ev e JOIN signup USING (user_id)
           |  WHERE event_type = 'purchase' AND es > t0 GROUP BY e.user_id)
           |SELECT s.user_id, s.t0,
           |       COALESCE(p.t1, h.h) - s.t0 AS duration_s,
           |       p.t1 IS NULL AS censored
           |FROM signup s LEFT JOIN purchase p ON s.user_id = p.user_id
           |CROSS JOIN h
           |ORDER BY s.user_id""".stripMargin)
  )

  /** Q117 — changepoint localization via CUSUM: per event type, daily
    * counts, their deviation from the type's mean daily rate, and the
    * running cumulative deviation — the curve whose extremum marks the
    * most likely rate-change day. The time-series anomaly view next to
    * q75 (pointwise outliers) and q111 (distribution drift).
    *
    * Cross-engine exactness: windowed double sums are NOT order-safe
    * across engines (segment-tree vs sequential accumulation), so the
    * deviations are clamped to DECIMAL(18,6) before the running sum —
    * decimal addition is order-free. The mean is rounded once to 6
    * decimals (exact-integer division, then the one rounding).
    *
    * Scale shape: one (type, day) combinable aggregate, a broadcast
    * per-type mean, one ordered window per type (days per type is
    * bounded by the horizon, not the event volume).
    */
  val q117 = Query(
    "q117_changepoint",
    (s, dir) => {
      val daily = eventsTss(s, dir)
        .groupBy(col("event_type"), (col("es") / 86400L).cast("long").as("day"))
        .agg(count(lit(1)).as("n"))
      val means = daily.groupBy("event_type")
        .agg(round(sum(col("n")).cast("double") / count(lit(1)).cast("double"), 6)
          .cast("decimal(18,6)").as("mean_n"))
      val w = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.join(broadcast(means), "event_type")
        .withColumn("dev", (col("n").cast("decimal(18,6)") - col("mean_n"))
          .cast("decimal(18,6)"))
        .withColumn("cusum",
          sum(col("dev")).over(w).cast("decimal(18,6)").cast("double"))
        .select(col("event_type"), col("day"), col("n"),
          col("dev").cast("double").as("dev"), col("cusum"))
        .orderBy("event_type", "day")
    },
    Some("""WITH daily AS (
           |  SELECT event_type,
           |         CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400 AS day,
           |         COUNT(*) AS n
           |  FROM events GROUP BY 1, 2),
           |means AS (
           |  SELECT event_type,
           |         CAST(round(CAST(SUM(n) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
           |              AS DECIMAL(18,6)) AS mean_n
           |  FROM daily GROUP BY event_type),
           |devs AS (
           |  SELECT d.event_type, d.day, d.n,
           |         CAST(CAST(d.n AS DECIMAL(18,6)) - m.mean_n AS DECIMAL(18,6)) AS dev
           |  FROM daily d JOIN means m USING (event_type))
           |SELECT event_type, day, n, CAST(dev AS DOUBLE) AS dev,
           |       CAST(CAST(SUM(dev) OVER (PARTITION BY event_type ORDER BY day
           |                                ROWS UNBOUNDED PRECEDING)
           |            AS DECIMAL(18,6)) AS DOUBLE) AS cusum
           |FROM devs ORDER BY event_type, day""".stripMargin)
  )

  /** Q122 — marketing attribution: credit each purchase to the channel
    * of the user's LAST touch (view/click) strictly before it, and —
    * in the same pass — to the FIRST touch ever (the two bookend
    * models every attribution report starts with). The fixture has no
    * channel column, so one is synthesized deterministically from the
    * touch event's id via [[Canon.md5Residue]] (the engine's one
    * portable hash — the assignment a real platform would persist).
    *
    * Semantics: per user, events ordered by (second, event_id); the
    * attributed touch is carried by `last/first(..., ignoreNulls)`
    * over a `[unboundedPreceding, -1]` frame — "strictly before" falls
    * out of the frame bound, not a self-join. Purchases with no prior
    * touch land in the explicit 'unattributed' bucket (dropping them
    * silently is the classic attribution-report bug).
    *
    * Cross-engine exactness: revenue through exact decimal; counts are
    * integers; the only doubles are Canon.outD boundary casts.
    *
    * Scale shape: one shuffle on user_id for the window, then a tiny
    * (model, channel) rollup; no join against the touch stream — the
    * window carries the needed state, which is how a 100 TB event log
    * avoids a purchase×touch blow-up.
    */
  val q122 = Query(
    "q122_attribution",
    (s, dir) => {
      val ev = eventsTss(s, dir)
        .select(col("user_id"), col("event_type"), col("event_id"),
          col("es"), col("value"))
        .withColumn("channel",
          when(!col("event_type").isin("view", "click"), lit(null))
            .otherwise(element_at(
              array(lit("direct"), lit("email"), lit("search"), lit("social")),
              (md5Residue(col("event_id").cast("string"), 4) + 1).cast("int"))))
      val w = Window.partitionBy("user_id")
        .orderBy(col("es").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val attributed = ev
        .withColumn("last_ch", last(col("channel"), ignoreNulls = true).over(w))
        .withColumn("first_ch", first(col("channel"), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
      def rollup(chCol: String, model: String): DataFrame =
        attributed.groupBy(
            coalesce(col(chCol), lit("unattributed")).as("channel"))
          .agg(count(lit(1)).as("n_purchases"),
            dsum(col("value")).as("revenue"))
          .withColumn("model", lit(model))
      rollup("last_ch", "last_touch").union(rollup("first_ch", "first_touch"))
        .select("model", "channel", "n_purchases", "revenue")
        .orderBy("model", "channel")
    },
    Some("""WITH ev AS (
           |  SELECT user_id, event_type, event_id,
           |         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es,
           |         value,
           |         CASE WHEN event_type IN ('view', 'click') THEN
           |           ['direct', 'email', 'search', 'social'][
           |             CAST(CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)), 1, 15))
           |                  AS BIGINT) % 4 + 1 AS INT)]
           |         END AS channel
           |  FROM events),
           |att AS (
           |  SELECT *,
           |         last_value(channel IGNORE NULLS) OVER (
           |           PARTITION BY user_id ORDER BY es, event_id
           |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_ch,
           |         first_value(channel IGNORE NULLS) OVER (
           |           PARTITION BY user_id ORDER BY es, event_id
           |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_ch
           |  FROM ev),
           |pur AS (SELECT * FROM att WHERE event_type = 'purchase')
           |SELECT 'last_touch' AS model,
           |       COALESCE(last_ch, 'unattributed') AS channel,
           |       COUNT(*) AS n_purchases,
           |       CAST(CAST(round(SUM(CAST(value AS DECIMAL(18,4))), 4)
           |            AS DECIMAL(18,4)) AS DOUBLE) AS revenue
           |FROM pur GROUP BY 2
           |UNION ALL
           |SELECT 'first_touch', COALESCE(first_ch, 'unattributed'), COUNT(*),
           |       CAST(CAST(round(SUM(CAST(value AS DECIMAL(18,4))), 4)
           |            AS DECIMAL(18,4)) AS DOUBLE)
           |FROM pur GROUP BY 2
           |ORDER BY model, channel""".stripMargin)
  )

  /** Q127 — gaps-and-islands: per user, maximal runs of CONSECUTIVE
    * active days (streaks) — the engagement metric behind "7-day
    * streak" features and churn models, and the canonical SQL
    * islands pattern q21's gap-based sessions cannot express (a
    * session ends on inactivity measured in seconds; an island is
    * day-grain adjacency).
    *
    * Algorithm: distinct active days per user, then the classic
    * day − row_number() island key (consecutive days share it); two
    * combinable aggregates over integer keys — fully exact.
    *
    * Scale shape: one distinct on (user, day), one user-keyed window
    * (bounded by active days per user, not events), two rollups on
    * the same key — a single shuffle lineage on user_id.
    */
  val q127 = Query(
    "q127_streaks",
    (s, dir) => {
      val days = eventsTss(s, dir)
        .select(col("user_id"), (col("es") / 86400L).cast("long").as("day"))
        .distinct()
      val w = Window.partitionBy("user_id").orderBy("day")
      val islands = days
        .withColumn("grp", col("day") - row_number().over(w))
        .groupBy(col("user_id"), col("grp"))
        .agg(count(lit(1)).as("len"))
      islands.groupBy("user_id")
        .agg(count(lit(1)).as("n_streaks"),
          max(col("len")).as("longest"),
          sum(col("len")).as("active_days"))
        .orderBy("user_id")
    },
    Some("""WITH days AS (
           |  SELECT DISTINCT user_id,
           |         CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400 AS day
           |  FROM events),
           |islands AS (
           |  SELECT user_id,
           |         day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
           |  FROM days),
           |runs AS (
           |  SELECT user_id, grp, COUNT(*) AS len
           |  FROM islands GROUP BY 1, 2)
           |SELECT user_id, COUNT(*) AS n_streaks,
           |       CAST(MAX(len) AS BIGINT) AS longest,
           |       CAST(SUM(len) AS BIGINT) AS active_days
           |FROM runs GROUP BY 1 ORDER BY user_id""".stripMargin)
  )

  /** Q128 — time-weighted average (TWAP) of the event value per user:
    * each observation holds until the next one, so its weight is the
    * interval length — the correct average for irregularly-sampled
    * series (prices, gauges, engagement intensity) where the naive
    * mean over-weights bursts.
    *
    * Cross-engine exactness: value clamps to DECIMAL(12,4); Δt is an
    * exact integer second count; value·Δt stays decimal so the per-user
    * numerator sum is order-free; TWAP is the one boundary division.
    * The last observation per user carries no interval and is
    * excluded (declared semantics — an open-ended hold would need a
    * horizon convention like q113's censoring).
    *
    * Scale shape: one user-keyed ordered window for `lead`, then a
    * combinable aggregate on the same key — single shuffle lineage.
    */
  val q128 = Query(
    "q128_twap",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("es").asc, col("event_id").asc)
      eventsTss(s, dir)
        .select(col("user_id"), col("event_id"), col("es"), col("value"))
        .withColumn("dt", lead(col("es"), 1).over(w) - col("es"))
        .filter(col("dt").isNotNull)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_intervals"),
          sum(col("dt")).as("total_s"),
          sum(dec12(col("value")) * col("dt")).cast("decimal(18,4)").as("vw"))
        .filter(col("total_s") > 0)
        .withColumn("twap",
          col("vw").cast("double") / col("total_s").cast("double"))
        .select("user_id", "n_intervals", "total_s", "twap")
        .orderBy("user_id")
    },
    Some("""WITH ev AS (
           |  SELECT user_id, event_id,
           |         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es,
           |         value
           |  FROM events),
           |iv AS (
           |  SELECT user_id, value,
           |         lead(es) OVER (PARTITION BY user_id ORDER BY es, event_id)
           |           - es AS dt
           |  FROM ev),
           |agg AS (
           |  SELECT user_id, COUNT(*) AS n_intervals,
           |         CAST(SUM(dt) AS BIGINT) AS total_s,
           |         CAST(round(SUM(CAST(value AS DECIMAL(12,4)) * dt), 4)
           |              AS DECIMAL(18,4)) AS vw
           |  FROM iv WHERE dt IS NOT NULL GROUP BY 1
           |  HAVING CAST(SUM(dt) AS BIGINT) > 0)
           |SELECT user_id, n_intervals, total_s,
           |       CAST(vw AS DOUBLE) / CAST(total_s AS DOUBLE) AS twap
           |FROM agg ORDER BY user_id""".stripMargin)
  )

  /** Q130 — exponential-decay engagement score: per user,
    * Σ value·2^(−age_days/7) against the corpus horizon (7-day
    * half-life, day-granularity age) — the recency-weighted activity
    * feature recommender and churn models consume, where yesterday's
    * purchase outweighs last month's. The horizon is data-derived
    * (max event second), not wall-clock, so the result is
    * reproducible.
    *
    * Cross-engine exactness: NO libm in the decay path. A per-event
    * `round(pow(2, −age/7d), 6)` diverged between JVM `Math.pow` /
    * BigDecimal-rounding and DuckDB's libm/`round` for ~1 in 10⁵
    * events (observed at sf0.01, two distinct users across two
    * formulations — see the cross-engine-rounding rule). Instead age
    * is quantized to whole days and 2^(−days/7) decomposed as
    * 2^(−q)·2^(−r/7), days = 7q+r: the seven 2^(−r/7) constants are
    * shared micro-unit literals, and the 2^(−q) step is
    * `floor(c_r / 2^q)` — `pow(2, integer)` is exact in every IEEE
    * libm and division by a power of two is exact FP, so
    * `decay_micro` is integer-identical in both engines. value (2dp)
    * × decay_micro is an exact decimal product; the per-user sum is
    * order-free; the final double division by 1e6 is one IEEE op on
    * identical inputs.
    *
    * Scale shape: broadcast horizon scalar + pure map-side decay +
    * one user-keyed combinable aggregate — the cheapest possible
    * shape.
    */
  val q130 = Query(
    "q130_decay_score",
    (s, dir) => {
      val ev = eventsTss(s, dir)
        .select(col("user_id"), col("es"), col("value"))
      val hz = ev.agg(max(col("es")).as("t_max"))
      ev.crossJoin(broadcast(hz))
        .withColumn("days", ((col("t_max") - col("es")) / lit(86400L)).cast("long"))
        .withColumn("cr",
          element_at(
            array(lit(1000000L), lit(905724L), lit(820335L), lit(742997L),
              lit(672950L), lit(609507L), lit(552045L)),
            (col("days") % 7).cast("int") + 1))
        .withColumn("decay_micro",
          floor(col("cr").cast("double") /
            pow(lit(2.0), (col("days") / lit(7L)).cast("long").cast("double")))
            .cast("long"))
        .withColumn("contrib",
          col("value").cast("decimal(12,2)") * col("decay_micro"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          (sum(col("contrib")).cast("decimal(18,2)").cast("double") / lit(1e6))
            .as("score"))
        .orderBy("user_id")
    },
    Some("""WITH ev AS (
           |  SELECT user_id,
           |         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es,
           |         value
           |  FROM events),
           |hz AS (SELECT MAX(es) AS t_max FROM ev),
           |dk AS (
           |  SELECT user_id, value,
           |         CAST(FLOOR(
           |           CAST(([1000000, 905724, 820335, 742997, 672950, 609507, 552045]
           |                 [CAST((t_max - es) // 86400 AS BIGINT) % 7 + 1]) AS DOUBLE)
           |           / pow(2.0, CAST(((t_max - es) // 86400) // 7 AS DOUBLE)))
           |         AS BIGINT) AS decay_micro
           |  FROM ev, hz)
           |SELECT user_id, COUNT(*) AS n_events,
           |       CAST(CAST(SUM(CAST(value AS DECIMAL(12,2)) * decay_micro)
           |                 AS DECIMAL(18,2)) AS DOUBLE) / 1e6 AS score
           |FROM dk GROUP BY user_id ORDER BY user_id""".stripMargin)
  )

  /** Q134 — rolling 7-day distinct actives (the DAU/WAU/stickiness
    * board every growth team watches): per day with activity, the
    * day's distinct users, the distinct users over the trailing 7-day
    * window, and their ratio.
    *
    * Scale design: a rolling COUNT(DISTINCT) cannot ride a window
    * frame (distinct doesn't decompose over frames), and the naive
    * `days × activity` range join degrades to a per-day rescan of the
    * event log. Instead each distinct (user, day) fact is fanned out
    * to the ≤ 7 window-end days it can serve (`sequence` + `explode` —
    * a fixed ×7 expansion, not a blow-up), semi-joined to the observed
    * days (broadcast — bounded by the horizon, not the volume), and
    * counted with a plain combinable distinct aggregate on `day`.
    * That plan is one shuffle wide at any corpus size.
    *
    * Cross-engine exactness: pure integer counts; the stickiness
    * ratio is one IEEE division of two exact BIGINTs.
    */
  val q134 = Query(
    "q134_rolling_distinct",
    (s, dir) => {
      val base = eventsTss(s, dir)
        .select(col("user_id"), (col("es") / 86400L).cast("long").as("day"))
        .distinct()
      val days = base.select("day").distinct()
      val wau = base
        .select(col("user_id"),
          explode(sequence(col("day"), col("day") + lit(6L))).as("day"))
        .join(broadcast(days), "day")
        .groupBy("day").agg(countDistinct("user_id").as("wau"))
      val dau = base.groupBy("day").agg(count(lit(1)).as("dau"))
      dau.join(wau, "day")
        .withColumn("stickiness",
          col("dau").cast("double") / col("wau").cast("double"))
        .select("day", "dau", "wau", "stickiness")
        .orderBy("day")
    },
    Some("""WITH base AS (
           |  SELECT DISTINCT user_id,
           |         CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400 AS day
           |  FROM events),
           |days AS (SELECT DISTINCT day FROM base),
           |wau AS (
           |  SELECT d.day, CAST(COUNT(DISTINCT b.user_id) AS BIGINT) AS wau
           |  FROM days d JOIN base b ON b.day BETWEEN d.day - 6 AND d.day
           |  GROUP BY 1),
           |dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM base GROUP BY 1)
           |SELECT d.day, d.dau, w.wau,
           |       CAST(d.dau AS DOUBLE) / CAST(w.wau AS DOUBLE) AS stickiness
           |FROM dau d JOIN wau w USING (day) ORDER BY day""".stripMargin)
  )

  /** Q143 — interval coalescing: each event opens a 30-minute validity
    * interval `[es, es+1800)`; per user, overlapping or touching
    * intervals are merged into maximal covered spans — the union-of-
    * ranges operation behind subscription-coverage, on-call overlap,
    * and "effective watch time" metrics. Distinct from q21's sessions
    * (gap between POINTS) and q127's islands (day-grain adjacency):
    * here the inputs are RANGES of fixed width whose unions must be
    * taken exactly.
    *
    * Algorithm: the classic sweep — order intervals by start within
    * user; a new span begins where `start` exceeds the running max of
    * all previous `end`s. Both the running max and the span id
    * (running sum of the break flag) are growing frames over one
    * user-keyed sort, then one rollup per (user, span) and one per
    * user — a single shuffle lineage on user_id, no self-join (the
    * naive overlap self-join is quadratic per user at 100 TB).
    *
    * Cross-engine exactness: all arithmetic on exact BIGINT seconds.
    */
  val q143 = Query(
    "q143_interval_merge",
    (s, dir) => {
      val iv = eventsTss(s, dir)
        .select(col("user_id"), col("es").as("st"),
          (col("es") + lit(1800L)).as("en"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("st").asc, col("en").asc)
      val prevMax = max(col("en")).over(
        w.rowsBetween(Window.unboundedPreceding, -1))
      val spans = iv
        .withColumn("brk",
          when(col("st") > coalesce(prevMax, lit(Long.MinValue)), lit(1L))
            .otherwise(lit(0L)))
        .withColumn("span",
          sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("span"))
        .agg(min("st").as("st"), max("en").as("en"),
          count(lit(1)).as("n_events"))
      spans.groupBy("user_id")
        .agg(count(lit(1)).as("n_spans"),
          sum(col("en") - col("st")).as("covered_s"),
          max(col("en") - col("st")).as("longest_s"),
          sum("n_events").as("n_events"))
        .orderBy("user_id")
    },
    Some("""WITH iv AS (
           |  SELECT user_id,
           |         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS st,
           |         CAST(epoch(date_trunc('second', ts)) AS BIGINT) + 1800 AS en
           |  FROM events),
           |marked AS (
           |  SELECT *,
           |         CASE WHEN st > COALESCE(max(en) OVER (
           |                  PARTITION BY user_id ORDER BY st, en
           |                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           |                -9223372036854775808) THEN 1 ELSE 0 END AS brk
           |  FROM iv),
           |spanned AS (
           |  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY st, en
           |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span
           |  FROM marked),
           |spans AS (
           |  SELECT user_id, span, MIN(st) AS st, MAX(en) AS en,
           |         COUNT(*) AS n_events
           |  FROM spanned GROUP BY 1, 2)
           |SELECT user_id, COUNT(*) AS n_spans,
           |       CAST(SUM(en - st) AS BIGINT) AS covered_s,
           |       CAST(MAX(en - st) AS BIGINT) AS longest_s,
           |       CAST(SUM(n_events) AS BIGINT) AS n_events
           |FROM spans GROUP BY 1 ORDER BY user_id""".stripMargin)
  )

  /** Q146 — seasonality-normalized anomaly screen: a raw daily event
    * count can't be judged against a global mean when traffic has a
    * weekly rhythm — Sunday is always low, Monday always high. Each
    * (event_type, day) count is compared to a leave-one-out baseline:
    * the mean daily count of the SAME event type on the SAME weekday,
    * excluding the day under test (excluding it keeps the anomaly from
    * polluting its own baseline). Days above 1.5× baseline are flagged.
    *
    * Cross-engine exactness: the flag is decided by integer cross-
    * multiplication (`2·n·(cnt−1) > 3·(sum−n)`) — no division ever
    * enters the comparison, so the boolean is exact; the reported
    * baseline is one IEEE division of exact BIGINTs at the output
    * boundary.
    *
    * Scale shape: one combinable groupBy(type, day) at event grain,
    * then a window over the tiny (type, dow) groups of daily rows —
    * everything after the first rollup is kilobytes regardless of
    * corpus size.
    */
  val q146 = Query(
    "q146_seasonal_anomaly",
    (s, dir) => {
      val daily = eventsTss(s, dir)
        .select(col("event_type"), (col("es") / 86400L).cast("long").as("day"))
        .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
        .withColumn("dow", pmod(col("day") + lit(4L), lit(7L)))
      val w = Window.partitionBy("event_type", "dow")
      daily
        .withColumn("peer_sum", sum("n").over(w) - col("n"))
        .withColumn("peer_cnt", count(lit(1)).over(w) - lit(1L))
        .filter(col("peer_cnt") > 0)
        .withColumn("baseline",
          col("peer_sum").cast("double") / col("peer_cnt").cast("double"))
        .withColumn("is_anomaly",
          col("n") * col("peer_cnt") * lit(2L) > col("peer_sum") * lit(3L))
        .select("event_type", "day", "dow", "n", "baseline", "is_anomaly")
        .orderBy("event_type", "day")
    },
    Some("""WITH daily AS (
           |  SELECT event_type,
           |         CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400 AS day,
           |         COUNT(*) AS n
           |  FROM events GROUP BY 1, 2),
           |dowd AS (SELECT *, (day + 4) % 7 AS dow FROM daily),
           |peers AS (
           |  SELECT *,
           |         SUM(n) OVER (PARTITION BY event_type, dow) - n AS peer_sum,
           |         COUNT(*) OVER (PARTITION BY event_type, dow) - 1 AS peer_cnt
           |  FROM dowd)
           |SELECT event_type, day, dow, CAST(n AS BIGINT) AS n,
           |       CAST(peer_sum AS DOUBLE) / CAST(peer_cnt AS DOUBLE) AS baseline,
           |       2 * n * peer_cnt > 3 * peer_sum AS is_anomaly
           |FROM peers WHERE peer_cnt > 0
           |ORDER BY event_type, day""".stripMargin)
  )

  /** Q151 — dyadic EWMA smoothing of daily event rates: an
    * exponentially-weighted moving average with half-per-day decay over
    * a trailing 8-day horizon, on the zero-filled day spine. The
    * smoother that sits between q117's global CUSUM and q146's seasonal
    * baseline — the "current level" estimate alerting compares against.
    *
    * Exactness device: weights are powers of two (lag k weighs
    * 2^(7−k)), so numerator and denominator are exact BIGINTs — the
    * whole smoother is integer arithmetic with ONE final IEEE division,
    * hash-checkable cross-engine with no libm anywhere (the q130 rule;
    * a float alpha^k recurrence would drift per-row). Early rows use
    * the truncated-horizon denominator 2^8 − 2^(7−m) rather than
    * renormalizing, so the series has no warm-up bias jump.
    *
    * Scale shape: one (type, day) combinable count, a per-type spine
    * (sequence explode bounded by calendar span), and one bounded
    * 8-lag window over the day grain — post-rollup data, KB-sized at
    * any corpus scale.
    */
  val q151 = Query(
    "q151_ewma",
    (s, dir) => {
      val daily = eventsTss(s, dir)
        .groupBy(col("event_type"), (col("es") / 86400L).cast("long").as("day"))
        .agg(count(lit(1)).as("n"))
      val spine = daily.groupBy("event_type")
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("event_type"), explode(sequence(col("d0"), col("d1"))).as("day"))
      val dense = spine.join(daily, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day"), coalesce(col("n"), lit(0L)).as("n"))
      val w = Window.partitionBy("event_type").orderBy("day")
      val num = (0 to 7).map(k =>
        lit(1L << (7 - k)) * coalesce(lag(col("n"), k).over(w), lit(0L)))
        .reduce(_ + _)
      dense
        .withColumn("m", least(lit(7L), row_number().over(w).cast("long") - 1L))
        .withColumn("wsum", num)
        .withColumn("den", expr("cast(256 - shiftleft(1, cast(7 - m as int)) as bigint)"))
        .select(col("event_type"), col("day"), col("n"), col("wsum"), col("den"),
          (col("wsum").cast("double") / col("den").cast("double")).as("ewma"))
        .orderBy("event_type", "day")
    },
    Some("""WITH daily AS (
           |  SELECT event_type,
           |         CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400 AS day,
           |         CAST(COUNT(*) AS BIGINT) AS n
           |  FROM events GROUP BY 1, 2),
           |spine AS (
           |  SELECT event_type, unnest(generate_series(min(day), max(day))) AS day
           |  FROM daily GROUP BY event_type),
           |dense AS (
           |  SELECT s.event_type, s.day, COALESCE(d.n, 0) AS n
           |  FROM spine s LEFT JOIN daily d
           |    ON s.event_type = d.event_type AND s.day = d.day),
           |lagged AS (
           |  SELECT event_type, day, n,
           |         least(7, row_number() OVER w - 1) AS m,
           |         128 * n
           |       +  64 * COALESCE(lag(n, 1) OVER w, 0)
           |       +  32 * COALESCE(lag(n, 2) OVER w, 0)
           |       +  16 * COALESCE(lag(n, 3) OVER w, 0)
           |       +   8 * COALESCE(lag(n, 4) OVER w, 0)
           |       +   4 * COALESCE(lag(n, 5) OVER w, 0)
           |       +   2 * COALESCE(lag(n, 6) OVER w, 0)
           |       +   1 * COALESCE(lag(n, 7) OVER w, 0) AS wsum
           |  FROM dense WINDOW w AS (PARTITION BY event_type ORDER BY day))
           |SELECT event_type, day, n, CAST(wsum AS BIGINT) AS wsum,
           |       CAST(256 - (1 << CAST(7 - m AS INTEGER)) AS BIGINT) AS den,
           |       CAST(wsum AS DOUBLE) / CAST(256 - (1 << CAST(7 - m AS INTEGER)) AS DOUBLE) AS ewma
           |FROM lagged ORDER BY event_type, day""".stripMargin)
  )

  /** Q152 — top event-sequence paths: the 10 most common length-3 runs
    * of consecutive event types across all users' time-ordered streams
    * — the path-analysis rollup q102's single-step transition matrix
    * cannot express (a Markov chain factors away exactly the multi-step
    * correlations this surfaces). Reuses q112's deterministic
    * sort-struct sequence device; trigram extraction is a bounded
    * per-user explode, the count one combinable aggregation on the
    * trigram key, and the top-10 a TakeOrdered with lexical tiebreak.
    */
  val q152 = Query(
    "q152_path_trigrams",
    (s, dir) => {
      val seqs = eventsTss(s, dir)
        .groupBy("user_id")
        .agg(transform(
          array_sort(collect_list(struct(col("es"), col("event_id"), col("event_type")))),
          x => x.getField("event_type")).as("path"))
        .withColumn("n", size(col("path")).cast("long"))
        .filter(col("n") >= 3)
      seqs
        .withColumn("i", explode(sequence(lit(1L), col("n") - 2L)))
        .select(concat_ws(">",
          element_at(col("path"), col("i").cast("int")),
          element_at(col("path"), (col("i") + 1L).cast("int")),
          element_at(col("path"), (col("i") + 2L).cast("int"))).as("trigram"))
        .groupBy("trigram")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("trigram").asc)
        .limit(10)
    },
    Some("""WITH seqs AS (
           |  SELECT user_id,
           |         list(event_type ORDER BY
           |              CAST(epoch(date_trunc('second', ts)) AS BIGINT),
           |              event_id) AS path,
           |         CAST(COUNT(*) AS BIGINT) AS n
           |  FROM events GROUP BY user_id),
           |tri AS (
           |  SELECT concat(path[i], '>', path[i+1], '>', path[i+2]) AS trigram
           |  FROM (SELECT path, unnest(generate_series(1, CAST(n - 2 AS BIGINT))) AS i
           |        FROM seqs WHERE n >= 3))
           |SELECT trigram, COUNT(*) AS cnt
           |FROM tri GROUP BY trigram
           |ORDER BY cnt DESC, trigram ASC LIMIT 10""".stripMargin)
  )

  /** Q157 — watermark-lateness audit: how out-of-order is the stream,
    * really? For each event (in `event_id` arrival order — the
    * fixture's generation order), lateness = seconds behind the
    * running event-time high-water mark; the histogram over standard
    * watermark bands tells you what `withWatermark` horizon drops what
    * fraction — the number you must measure BEFORE picking the horizon
    * (q20/q21's watermarks, StreamingPipeline's late-drop policy), not
    * after data silently vanishes.
    *
    * The running-max window is inherently sequential in arrival order;
    * here it runs over the whole fixture (one ordered pass), at
    * cluster scale per source partition (Kafka guarantees order only
    * within a partition, so per-partition high-water marks are the
    * semantically right grain there anyway).
    */
  val q157 = Query(
    "q157_late_data_audit",
    (s, dir) => {
      val w = Window.orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      eventsTss(s, dir)
        .select(col("event_id"), col("es"))
        .withColumn("late_s", max(col("es")).over(w) - col("es"))
        .withColumn("bucket_id",
          when(col("late_s") === 0, 0L).when(col("late_s") <= 300, 1L)
            .when(col("late_s") <= 600, 2L).when(col("late_s") <= 1800, 3L)
            .when(col("late_s") <= 3600, 4L).otherwise(5L))
        .groupBy("bucket_id")
        .agg(count(lit(1)).as("n"), max(col("late_s")).as("max_late_s"))
        .withColumn("bucket",
          element_at(array(lit("on-time"), lit("<=5m"), lit("<=10m"),
            lit("<=30m"), lit("<=1h"), lit(">1h")), (col("bucket_id") + 1).cast("int")))
        .select("bucket_id", "bucket", "n", "max_late_s")
        .orderBy("bucket_id")
    },
    Some("""WITH hw AS (
           |  SELECT event_id,
           |         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es,
           |         CAST(max(CAST(epoch(date_trunc('second', ts)) AS BIGINT))
           |              OVER (ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING
           |                    AND CURRENT ROW) AS BIGINT) AS hwm
           |  FROM events),
           |lat AS (
           |  SELECT CAST(CASE WHEN hwm - es = 0 THEN 0 WHEN hwm - es <= 300 THEN 1
           |              WHEN hwm - es <= 600 THEN 2 WHEN hwm - es <= 1800 THEN 3
           |              WHEN hwm - es <= 3600 THEN 4 ELSE 5 END AS BIGINT) AS bucket_id,
           |         hwm - es AS late_s
           |  FROM hw)
           |SELECT bucket_id,
           |       (['on-time', '<=5m', '<=10m', '<=30m', '<=1h', '>1h'])[bucket_id + 1]
           |         AS bucket,
           |       CAST(COUNT(*) AS BIGINT) AS n,
           |       CAST(max(late_s) AS BIGINT) AS max_late_s
           |FROM lat GROUP BY bucket_id ORDER BY bucket_id""".stripMargin)
  )

  /** Q158 — rolling 7-day distinct actives via MERGEABLE HLL sketches:
    * the at-scale replacement for q134's exact fan-out COUNT(DISTINCT).
    * Each day keeps ONE bounded sketch of its user set; the trailing
    * window is a sketch UNION (sketches are a commutative monoid, like
    * q141's partial aggregates), so the rolling distinct never
    * re-touches event-grain data — the same exact→sketch swap q91
    * makes for quantiles and q62 for global distincts. Rows-only by
    * design (estimates are engine-specific); TemporalSpec pins every
    * estimate within 5% of q134's exact WAU.
    */
  val q158 = Query(
    "q158_rolling_hll",
    (s, dir) => {
      val daily = eventsTss(s, dir)
        .select(col("user_id"), (col("es") / 86400L).cast("long").as("day"))
        .groupBy("day").agg(hll_sketch_agg(col("user_id")).as("sk"))
      val days = daily.select("day").distinct()
      daily
        .select(col("sk"), explode(sequence(col("day"), col("day") + 6L)).as("day"))
        .join(broadcast(days), "day")
        .groupBy("day")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("wau_est"))
        .orderBy("day")
    },
    None
  )

  /** Q178 — DYNAMIC-gap session windows: `session_window` with a
    * per-event gap expression (purchases close their sessions after
    * 10 min, everything else after 30) — the form q21's fixed gap
    * can't express and the one checkout/abandonment analyses actually
    * need (a purchase ends engagement quickly; browsing lingers). A
    * session's end is max(event_ts + that event's gap) and an event
    * joins while its ts ≤ the running end — the oracle restates
    * exactly that with a running-max-of-ends gaps-and-islands
    * construction (strict `>` split, matching the q21 boundary
    * semantics). Same one-shuffle-per-user scale shape as q21.
    */
  val q178 = Query(
    "q178_dynamic_session",
    (s, dir) =>
      eventsTss(s, dir)
        .groupBy(
          session_window(col("tss"),
            when(col("event_type") === "purchase", "10 minutes")
              .otherwise("30 minutes")),
          col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          count_if(col("event_type") === "purchase").as("n_purchases"),
          dsum(col("value")).as("sum_value"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n_events"), col("n_purchases"), col("sum_value"))
        .orderBy("user_id", "session_start"),
    Some("""WITH e AS (
           |  SELECT user_id, event_type, value,
           |         date_trunc('second', ts) AS tss,
           |         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es,
           |         CAST(epoch(date_trunc('second', ts)) AS BIGINT) +
           |           CASE WHEN event_type = 'purchase' THEN 600 ELSE 1800 END
           |           AS e_end
           |  FROM events),
           |m AS (
           |  SELECT *,
           |         MAX(e_end) OVER (PARTITION BY user_id ORDER BY es, value
           |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           |           AS prev_end
           |  FROM e),
           |marked AS (
           |  SELECT *, CASE WHEN prev_end IS NULL OR es > prev_end
           |                 THEN 1 ELSE 0 END AS new_session
           |  FROM m),
           |sessions AS (
           |  SELECT *, SUM(new_session) OVER (PARTITION BY user_id
           |            ORDER BY es, value
           |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           |  FROM marked)
           |SELECT user_id, MIN(tss) AS session_start,
           |       MAX(tss + CASE WHEN event_type = 'purchase'
           |                 THEN INTERVAL 10 MINUTE
           |                 ELSE INTERVAL 30 MINUTE END) AS session_end,
           |       COUNT(*) AS n_events,
           |       CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT)
           |         AS n_purchases,
           |       CAST(CAST(round(SUM(CAST(value AS DECIMAL(18,4))), 4)
           |         AS DECIMAL(18,4)) AS DOUBLE) AS sum_value
           |FROM sessions
           |GROUP BY user_id, sid
           |ORDER BY user_id, session_start""".stripMargin)
  )

  /** Q177 — the VARIANT path through the semi-structured column: Spark
    * 4's open-ended JSON type (`parse_json` → shredded binary VARIANT →
    * typed `variant_get` extraction), the third member of the
    * extraction family next to q22's per-path `get_json_object` and
    * q71's pinned-schema `from_json`. Same aggregate contract as both
    * so the three forms are directly comparable; VARIANT is the one
    * that keeps the WHOLE document queryable without re-parsing per
    * path or pinning a schema up front — the semi-structured answer a
    * 100 TB event lake actually wants (parse once at ingest, store
    * shredded, extract lazily). `try_parse_json` states the
    * malformed-row contract (null, counted) explicitly. The oracle is
    * the same typed extraction through DuckDB's JSON machinery. */
  val q177 = Query(
    "q177_variant_json",
    (s, dir) =>
      Tables.events(s, dir)
        .withColumn("v", try_parse_json(col("props")))
        .select(col("event_type"),
          try_variant_get(col("v"), "$.k", "long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          count(col("k")).as("n_extracted"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .orderBy("event_type"),
    Some("""SELECT event_type, COUNT(*) AS n,
           |       COUNT(CAST(props->>'$.k' AS BIGINT)) AS n_extracted,
           |       CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           |       MIN(CAST(props->>'$.k' AS BIGINT)) AS min_k,
           |       MAX(CAST(props->>'$.k' AS BIGINT)) AS max_k
           |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
  )

  /** Q186 — interval–interval overlap join: user activity intervals
    * (each event opens a 30-min validity window, q143's intervals
    * UN-merged) against synthesized per-type daily maintenance windows
    * (2 h, start offset derived from the type's md5 residue), reporting
    * per maintenance window how many activity intervals and distinct
    * users it intersects. q18 joins POINTS to intervals; this joins
    * intervals to intervals — the shape behind span-conflict detection,
    * ad-flight attribution and downtime impact analysis.
    *
    * Scale design: a naive `a.start < b.end AND b.start < a.end` theta
    * join is a cross product. Both interval sets are fanned out to the
    * fixed-width time cells they cover (cell = 2 h, the longer
    * interval's length, so each side lands in ≤ 2 cells), the join is a
    * pure equi-join on the cell, the overlap predicate filters inside
    * the cell, and a DISTINCT collapses pairs found in both shared
    * cells — bounded fan-out, bounded cells, no quadratic stage, same
    * no-false-negative argument as q18/q56. The oracle states the naive
    * theta-join semantics, proving the cell decomposition lossless.
    */
  val q186 = Query(
    "q186_interval_overlap",
    (s, dir) => {
      val ev = eventsTss(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("es"))
      val a = ev.select(col("event_id").as("a_id"), col("user_id"),
        col("es").as("a_start"), (col("es") + 1800L).as("a_end"))
      val b = ev.select(col("event_type"), expr("es div 86400").as("day"))
        .distinct()
        .withColumn("b_start",
          col("day") * 86400L + md5Residue(col("event_type"), 12) * 3600L)
        .withColumn("b_end", col("b_start") + 7200L)
      val w = 7200L
      val aCells = a.withColumn("cell",
        explode(sequence(expr(s"a_start div $w"), expr(s"(a_end - 1) div $w"))))
      val bCells = b.withColumn("cell",
        explode(sequence(expr(s"b_start div $w"), expr(s"(b_end - 1) div $w"))))
      aCells.join(bCells, Seq("cell"))
        .filter(col("a_start") < col("b_end") && col("b_start") < col("a_end"))
        .select("event_type", "day", "a_id", "user_id")
        .distinct()
        .groupBy("event_type", "day")
        .agg(count(lit(1)).as("n_intervals"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("event_type", "day")
    },
    Some("""WITH e AS (
           |  SELECT event_id, user_id, event_type,
           |         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es
           |  FROM events),
           |a AS (SELECT event_id AS a_id, user_id, es AS a_start,
           |             es + 1800 AS a_end FROM e),
           |days AS (SELECT DISTINCT event_type, es // 86400 AS day FROM e),
           |b AS (SELECT event_type, day,
           |             day * 86400 +
           |             (CAST(concat('0x', substr(md5(event_type), 1, 15)) AS BIGINT) % 12) * 3600 AS b_start
           |      FROM days),
           |ov AS (
           |  SELECT DISTINCT b.event_type, b.day, a.a_id, a.user_id
           |  FROM a JOIN b
           |    ON a.a_start < b.b_start + 7200 AND b.b_start < a.a_end)
           |SELECT event_type, day, COUNT(*) AS n_intervals,
           |       COUNT(DISTINCT user_id) AS n_users
           |FROM ov GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  )

  /** Q191 — dead-letter quarantine flow: classify every inbound event
    * payload as `valid` / `bad_type` / `malformed`, route good rows to
    * the output aggregate and keep the rejects AS DATA with a reason —
    * the ETL pattern behind every production ingest (the reference's
    * regex-validate-then-CASE, createDW.sql:67-80, silently nulls bad
    * rows; a dead-letter queue makes them first-class so upstream
    * breakage is visible and replayable). The fixture's JSON is all
    * valid, so corruption is SYNTHESIZED deterministically: md5-residue
    * 0 (mod 13) payloads lose their closing brace (truncated JSON —
    * chosen over appended garbage, which Spark's lenient variant
    * parser ACCEPTS after the first complete value while DuckDB
    * rejects it; truncation is malformed in both), residue 1 gets its
    * numeric `k` re-quoted as a non-numeric string (type error) —
    * both engines build the identical corrupt text.
    *
    * Classification is all try-semantics (`try_parse_json` →
    * `try_variant_get`), never exceptions: parse failure → malformed;
    * parsed but the typed extraction fails → bad_type; else valid.
    * One map-side classify + one combinable rollup; at 100 TB the
    * quarantined rows would additionally be written to their own sink
    * (the versioned table), which is a `when`-filtered second write of
    * the same classified frame.
    */
  /** The q191 classification over an (event_id, props) frame — shared
    * with [[graft.streaming.StreamingPipeline.quarantineQuery]] so the
    * batch readout and the streaming router can never drift. Emits
    * (event_id, status, k, raw) — `raw` is the (possibly corrupt)
    * payload itself, which the DLQ MUST retain for replay-after-fix;
    * the batch rollup drops it at aggregation. Corruption synthesis
    * included (see q191). */
  private[graft] def quarantineClassify(ev: DataFrame): DataFrame = {
    val res = md5Residue(col("event_id").cast("string"), 13)
    val raw = when(res === 0,
        expr("substring(props, 1, length(props) - 1)"))
      .when(res === 1,
        regexp_replace(col("props"), "\"k\": ([0-9]+)", "\"k\": \"s$1\""))
      .otherwise(col("props"))
    ev.withColumn("raw", raw)
      .withColumn("v", try_parse_json(col("raw")))
      .withColumn("k", try_variant_get(col("v"), "$.k", "long"))
      .withColumn("status",
        when(col("v").isNull, "malformed")
          .when(col("k").isNull, "bad_type")
          .otherwise("valid"))
      .select("event_id", "status", "k", "raw")
  }

  val q191 = Query(
    "q191_quarantine",
    (s, dir) => {
      val classified = quarantineClassify(
        Tables.events(s, dir).select(col("event_id"), col("props")))
      classified.groupBy("status")
        .agg(count(lit(1)).as("n"),
          min(col("event_id")).as("first_example"),
          sum(col("k")).as("sum_k"))
        .orderBy("status")
    },
    Some("""WITH c AS (
           |  SELECT event_id,
           |         CASE CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT) % 13
           |           WHEN 0 THEN substr(props, 1, len(props) - 1)
           |           WHEN 1 THEN regexp_replace(props, '"k": ([0-9]+)', '"k": "s\1"', 'g')
           |           ELSE props END AS raw
           |  FROM events),
           |cl AS (
           |  SELECT event_id,
           |         CASE WHEN NOT json_valid(raw) THEN 'malformed'
           |              WHEN TRY_CAST(raw->>'$.k' AS BIGINT) IS NULL THEN 'bad_type'
           |              ELSE 'valid' END AS status,
           |         CASE WHEN json_valid(raw)
           |              THEN TRY_CAST(raw->>'$.k' AS BIGINT) END AS k
           |  FROM c)
           |SELECT status, COUNT(*) AS n,
           |       MIN(event_id) AS first_example,
           |       CAST(SUM(k) AS BIGINT) AS sum_k
           |FROM cl GROUP BY status ORDER BY status""".stripMargin)
  )

  val all: Seq[Query] =
    Seq(q18, q19, q19b, q19c, q19d, q20a, q20b, q21, q22, q71, q72, q76, q87,
      q94, q97, q99, q100, q102, q107, q110, q112, q113, q117, q122, q127,
      q128, q130, q134, q143, q146, q151, q152, q157, q158, q177, q178, q186,
      q191)
}
