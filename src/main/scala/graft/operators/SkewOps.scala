package graft.operators

import graft.{Canon, Query, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shuffle-volume countermeasures: explicit key salting for skewed
  * joins, and semi-join Bloom pre-filtering for shuffle-input
  * reduction ([[q145]]).
  *
  * When one join key carries a disproportionate share of rows, the
  * shuffle partition that owns it becomes the straggler and caps the
  * whole stage at one task's throughput — at 100 TB a single hot key
  * (the null user, the default product id) can hold a 1000-executor
  * cluster at 1× parallelism. AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin`) is the first line of defense and is
  * enabled engine-wide; explicit salting is the fallback when the build
  * side is too large to broadcast AND the skew is known up front (AQE
  * splits probe-side partitions but still replicates nothing, so a
  * single giant build-side key group still lands in one task's hash
  * table).
  *
  * Mechanics: each probe-side row scatters to one of `nSalts` synthetic
  * sub-keys (deterministically, by hashing the whole row); the build
  * side replicates every row to ALL sub-keys. The join then shuffles on
  * (key, salt), spreading each hot key over `nSalts` partitions. Join
  * semantics are unchanged — proved by [[q57]], whose DuckDB oracle is
  * the PLAIN join.
  */
object SkewOps {
  import Canon._

  private val saltId = new java.util.concurrent.atomic.AtomicLong()

  /** Equi inner join of `big ⋈ small` on `bigKey = smallKey`, salted to
    * `nSalts` sub-keys. Both salt columns are dropped from the output.
    *
    * The probe-side salt is `monotonically_increasing_id % nSalts`
    * rather than a row-content hash: routing only needs to SPREAD rows,
    * and a content hash sends fully-identical duplicate rows of a hot
    * key to one salt — exactly the skew it was meant to break. The salt
    * value never reaches the output, so the result set is independent
    * of the assignment (q57's plain-join oracle proves it). Salt column
    * names are generated per call so chained salted joins (or inputs
    * that already carry a same-named column) cannot collide.
    */
  def saltedJoin(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String, nSalts: Int): DataFrame = {
    val id = saltId.incrementAndGet()
    val sb = s"__salt_b_$id"
    val ss = s"__salt_s_$id"
    val salted = big.withColumn(sb,
      pmod(monotonically_increasing_id(), lit(nSalts.toLong)))
    val replicated = small.withColumn(ss,
      explode(sequence(lit(0L), lit(nSalts.toLong - 1))))
    salted.join(replicated,
        salted(bigKey) === replicated(smallKey) &&
          salted(sb) === replicated(ss))
      .drop(sb, ss)
  }

  /** Q57 — the salted HyperJoin: identical semantics to the plain
    * enrichment join (the oracle IS the plain join — salting must be
    * invisible in the result), executed with part replicated ×8 and
    * lineitem scattered over (l_partkey, salt). */
  val q57 = Query(
    "q57_salted_join",
    (s, dir) =>
      saltedJoin(
        Tables.lineitem(s, dir)
          .select("l_orderkey", "l_linenumber", "l_partkey",
            "l_quantity", "l_extendedprice"),
        Tables.part(s, dir).select("p_partkey", "p_name", "p_retailprice"),
        "l_partkey", "p_partkey", nSalts = 8)
        .withColumn("sales",
          (dec12(col("l_extendedprice")) * dec12(col("l_quantity"))).cast("double"))
        .select("l_orderkey", "l_linenumber", "l_partkey", "p_name", "sales")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey"),
    Some("""SELECT l_orderkey, l_linenumber, l_partkey, p_name,
           |       CAST(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(l_quantity AS DECIMAL(12,4)) AS DOUBLE) AS sales
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |ORDER BY l_orderkey, l_linenumber, l_partkey""".stripMargin)
  )

  /** Q92 — Z-order clustering key: the bit-interleaved two-dimensional
    * sort key behind [[graft.sources.Sources.writeZOrderLayout]],
    * computed over (l_partkey, l_suppkey) ranks and oracle-checked
    * bit-for-bit (the DuckDB SQL is the generated unrolled OR chain of
    * the same interleave). The q42-style deterministic hash sample
    * bounds the output.
    *
    * Scale rationale: sorting by one column stripes files in that
    * column only — a predicate on the OTHER join key prunes nothing.
    * The interleaved key makes each file a small rectangle in
    * (partkey, suppkey) space, so parquet min/max stats prune on either
    * predicate; `SourcesSpec` measures per-file extents shrinking in
    * BOTH dimensions under the layout writer.
    */
  val q92 = Query(
    "q92_zorder_key",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(Canon.md5Residue(
          concat_ws("|", col("l_orderkey"), col("l_linenumber")), 20) === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          pmod(col("l_partkey"), lit(1024L)).as("px"),
          pmod(col("l_suppkey"), lit(1024L)).as("py"))
        .withColumn("zkey",
          graft.sources.Sources.zorderKey(col("px"), col("py"), 10))
        .orderBy("zkey", "l_orderkey", "l_linenumber"),
    Some(s"""WITH t AS (
           |  SELECT l_orderkey, l_linenumber,
           |         l_partkey % 1024 AS px, l_suppkey % 1024 AS py
           |  FROM lineitem
           |  WHERE CAST(concat('0x', substr(md5(concat(l_orderkey, '|', l_linenumber)), 1, 15)) AS BIGINT) % 20 = 0)
           |SELECT l_orderkey, l_linenumber, px, py,
           |       ${graft.sources.Sources.zorderKeySql("px", "py", 10)} AS zkey
           |FROM t ORDER BY zkey, l_orderkey, l_linenumber""".stripMargin)
  )

  /** Build a Bloom filter over `keys` (a LongType key column) and
    * return a codegen'd `might_contain` predicate Column for the probe
    * side. The filter binary is collected to the driver once — like the
    * IVF centroids it is fixed-size MODEL state (a few MB at 1% fpp for
    * tens of millions of keys), not data — and embedded as a literal,
    * so executors evaluate pure bit-probes with zero per-row overhead
    * (both `BloomFilterAggregate` and `BloomFilterMightContain` are the
    * native Catalyst expressions Spark's own runtime-filter rule
    * injects; here they are driven EXPLICITLY, for when AQE's
    * size-threshold heuristics decline to fire).
    */
  def bloomMightContain(keys: DataFrame, keyCol: String,
      probeKey: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.types.BinaryType
    val n = keys.count()
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(GraftColumnBridge.expression(col(keyCol)))),
      math.max(n, 1000L))
    val bf = keys.agg(GraftColumnBridge.column(agg.toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
    GraftColumnBridge.column(new BloomFilterMightContain(
      Literal.create(bf, BinaryType),
      new XxHash64(Seq(GraftColumnBridge.expression(probeKey)))))
  }

  /** Q145 — semi-join Bloom pre-filter: the urgent-order keys are
    * folded into a Bloom filter and the lineitem scan is pre-filtered
    * by `might_contain` BEFORE the join; the exact equi-join then
    * removes the false positives, so the result is bit-identical to
    * the plain join (the oracle IS the plain join — same proof shape
    * as q57).
    *
    * Why it earns its place at 100 TB: when the filtered dimension is
    * too large to broadcast, the plain plan shuffles the ENTIRE fact
    * table; the Bloom probe runs at the scan (scan-local, codegen'd,
    * no shuffle) and drops ~80% of fact rows before the exchange —
    * the manual form of Spark's `InjectRuntimeFilter`, for when its
    * 10 GB scan-size threshold or join-shape checks decline. With a
    * selectivity of |urgent|/|orders| ≈ 20% and fpp 3%, shuffle input
    * shrinks ~4.3×.
    */
  val q145 = Query(
    "q145_bloom_join",
    (s, dir) => {
      val urgent = Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_orderdate")
      val mc = bloomMightContain(
        urgent.select("o_orderkey"), "o_orderkey", col("l_orderkey"))
      Tables.lineitem(s, dir)
        .select("l_orderkey", "l_quantity", "l_extendedprice")
        .filter(mc)
        .join(urgent, col("l_orderkey") === col("o_orderkey"))
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          outD(round(sum(dec(col("l_extendedprice"))), 4)).as("revenue"))
        .orderBy("month")
    },
    Some("""SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           |       COUNT(*) AS n_items,
           |       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           |       CAST(CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 4) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
           |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |WHERE o_orderpriority = '1-URGENT'
           |GROUP BY 1 ORDER BY month""".stripMargin)
  )

  val all: Seq[Query] = Seq(q57, q92, q145)
}
