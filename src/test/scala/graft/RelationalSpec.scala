package graft

import graft.operators.RelationalOps
import org.apache.spark.sql.functions._

/** Operator-level semantics checks for the relational core. The full
  * value-level correctness gate is the DuckDB oracle (tools/check.py /
  * driver t2); these specs pin the algebraic invariants. */
class RelationalSpec extends SparkTestBase {

  test("q01 scan: 100 rows, pruned projection") {
    val df = RelationalOps.q01.build(spark, sf)
    assert(df.count() === 100)
    assert(df.columns.length === 7)
  }

  test("q03 hyperjoin: inner join row count equals matched lineitems") {
    val joined = RelationalOps.q03.build(spark, sf)
    val li = Tables.lineitem(spark, sf)
    val matched = li.join(Tables.part(spark, sf),
      col("l_partkey") === col("p_partkey"), "left_semi").count()
    assert(joined.count() === matched)
  }

  test("q03 hyperjoin: sales = price * qty (exact decimal)") {
    val row = RelationalOps.q03.build(spark, sf).limit(1)
      .join(Tables.lineitem(spark, sf).select("l_orderkey", "l_linenumber",
        "l_extendedprice", "l_quantity", "l_partkey", "l_suppkey"),
        Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity"))
      .select(col("sales"),
        (col("l_extendedprice").cast("decimal(12,4)") *
          col("l_quantity").cast("decimal(12,4)")).cast("double").as("expect"))
      .head()
    assert(row.getDouble(0) === row.getDouble(1))
  }

  test("join algebra: semi ∪ anti partitions the probe keys") {
    val c = Tables.customer(spark, sf)
    val o = Tables.orders(spark, sf)
    val semi = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi").count()
    val anti = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti").count()
    assert(semi + anti === c.count())
  }

  test("left join: inner rows ⊆ left rows; unmatched get nulls") {
    val p = Tables.part(spark, sf)
    val li = Tables.lineitem(spark, sf)
    val left = p.join(li, col("p_partkey") === col("l_partkey"), "left")
    val inner = p.join(li, col("p_partkey") === col("l_partkey"), "inner")
    assert(left.count() >= inner.count())
    assert(left.count() ===
      inner.count() + p.join(li, col("p_partkey") === col("l_partkey"), "left_anti").count())
  }

  test("q05 dedup: output keys unique, subset of input") {
    val out = RelationalOps.q05.build(spark, sf)
    assert(out.count() === out.select("o_orderkey").distinct().count())
    assert(out.count() <= Tables.orders(spark, sf).count())
  }

  test("q11 agg: group sums add up to global sum") {
    val df = RelationalOps.q11.build(spark, sf)
    val total = df.agg(sum("count_order")).head().getLong(0)
    assert(total === Tables.lineitem(spark, sf).count())
  }

  test("q14 window rank: at most 3 rows per nation, rn = 1..3") {
    val df = RelationalOps.q14.build(spark, sf)
    val maxPer = df.groupBy("n_name").count().agg(max("count")).head().getLong(0)
    assert(maxPer <= 3)
    assert(df.agg(max("rn")).head().getLong(0) <= 3)
  }

  test("q17 setops: union_all = rich + active; except ∩ intersect = ∅") {
    val df = RelationalOps.q17.build(spark, sf).cache()
    val byOp = df.groupBy("op").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byOp("union_all") ===
      byOp.getOrElse("except", 0L) + byOp("intersect") +
        (byOp("union_all") - byOp.getOrElse("except", 0L) - byOp("intersect")))
    val ex = df.filter(col("op") === "except").select("c_custkey")
    val in = df.filter(col("op") === "intersect").select("c_custkey")
    assert(ex.intersect(in).count() === 0)
  }

  test("q16 top-k plans as TakeOrderedAndProject (no global sort)") {
    val plan = RelationalOps.q16.build(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("q03 broadcast hint survives planning") {
    val plan = RelationalOps.q03.build(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("q03 broadcast HyperJoin measurably out-shuffles a forced shuffle join") {
    // not a plan-text assertion: MEASURED shuffle bytes via a task-end
    // listener (flushed deterministically through the test bridge).
    // The broadcast plan's only exchange is the output sort's range
    // partitioning; forcing the join to shuffle adds both join inputs.
    def measure(f: => Unit): Long = {
      val acc = new java.util.concurrent.atomic.AtomicLong(0)
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (te.taskMetrics != null)
            acc.addAndGet(te.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
      spark.sparkContext.addSparkListener(l)
      try {
        f
        org.apache.spark.GraftTestBridge.waitForListeners(spark.sparkContext)
      } finally spark.sparkContext.removeSparkListener(l)
      acc.get
    }
    val broadcastBytes = measure(RelationalOps.q03.build(spark, sf)
      .write.mode("overwrite").format("noop").save())
    // q03's broadcast() hint overrides any conf, so the comparison plan
    // is the same join forced to shuffle via an explicit merge-join hint.
    val forced = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).hint("shuffle_merge"),
        col("l_partkey") === col("p_partkey"), "inner")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity"), col("p_name"))
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    assert(forced.queryExecution.executedPlan.toString.contains("SortMergeJoin"))
    val forcedBytes = measure(forced
      .write.mode("overwrite").format("noop").save())
    assert(broadcastBytes < forcedBytes,
      s"broadcast $broadcastBytes >= forced $forcedBytes bytes")
  }

  test("q01 projection prunes parquet read schema") {
    val scan = RelationalOps.q01.build(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!scan.contains("l_comment")) // no extra columns
    assert(scan.contains("ReadSchema"))
  }

  test("runtime bloom filter injects on a selective shuffle join") {
    // the 100 TB path for non-broadcastable dims: Catalyst builds a
    // bloom filter from the selective (filtered) side and pushes a
    // might_contain probe into the fact scan, cutting shuffle volume
    // before the join. Size thresholds are production-tuned defaults
    // (10 GB application side) — lower them to exercise the rewrite at
    // fixture scale.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled"
    ).map(k => k -> conf.get(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      val dim = Tables.part(spark, sf)
        .filter(org.apache.spark.sql.functions.col("p_size") === 1)
      val joined = Tables.lineitem(spark, sf)
        .join(dim, org.apache.spark.sql.functions.col("l_partkey") ===
          org.apache.spark.sql.functions.col("p_partkey"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"), optimized)
      assert(joined.count() > 0)
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }

  test("q101 table diff: statuses partition the key universe, counts reconcile") {
    val df = RelationalOps.q101.build(spark, sf).cache()
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val orders = Tables.orders(spark, sf)
    val nOld = orders.filter(pmod(col("o_orderkey"), lit(11)) =!= 0).count()
    val nNew = orders.filter(pmod(col("o_orderkey"), lit(13)) =!= 0).count()
    // old side = removed + changed + unchanged; new side = added + changed + unchanged
    assert(m("removed") + m.getOrElse("changed", 0L) + m("unchanged") === nOld)
    assert(m("added") + m.getOrElse("changed", 0L) + m("unchanged") === nNew)
    // every key ≡ 0 (mod 7) surviving both sides must be 'changed'
    val changedExpect = orders
      .filter(pmod(col("o_orderkey"), lit(7)) === 0 &&
        pmod(col("o_orderkey"), lit(11)) =!= 0 &&
        pmod(col("o_orderkey"), lit(13)) =!= 0).count()
    assert(m.getOrElse("changed", 0L) === changedExpect)
  }

  test("q147 TPC-H Q5 shape: matches driver-side six-table brute force") {
    val df = RelationalOps.q147.build(spark, sf).cache()
    val ord = Tables.orders(spark, sf)
      .filter(year(col("o_orderdate")) === 1996)
      .select("o_orderkey", "o_custkey")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cust = Tables.customer(spark, sf).select("c_custkey", "c_nationkey")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val supp = Tables.supplier(spark, sf).select("s_suppkey", "s_nationkey")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val asiaNations = Tables.nation(spark, sf)
      .join(Tables.region(spark, sf), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA").select("n_nationkey", "n_name")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val acc = scala.collection.mutable.Map[String, (Long, BigDecimal)]()
    Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .collect().foreach { r =>
        for {
          ck <- ord.get(r.getLong(0))
          cn <- cust.get(ck)
          sn <- supp.get(r.getLong(1)) if sn == cn
          name <- asiaNations.get(sn)
        } {
          val ep = BigDecimal(r.getDouble(2)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          val disc = BigDecimal(1) -
            BigDecimal(r.getDouble(3)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          val (n, s) = acc.getOrElse(name, (0L, BigDecimal(0)))
          acc(name) = (n + 1, s + ep * disc)
        }
      }
    val got = df.collect()
    assert(got.map(_.getString(0)).toSeq === acc.keys.toSeq.sorted)
    got.foreach { r =>
      val (n, s) = acc(r.getString(0))
      assert(r.getLong(1) === n)
      assert(math.abs(r.getDouble(2) -
        s.setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-6)
    }
  }

  test("q182 volume shipping: both roles drawn from the pair, never equal") {
    val rows = RelationalOps.q182.build(spark, sf).collect()
    val pair = Set("NATION_11", "NATION_20")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(pair.contains(r.getString(0)) && pair.contains(r.getString(1)))
      assert(r.getString(0) !== r.getString(1))
      assert(r.getLong(2) === 1995L || r.getLong(2) === 1996L)
      assert(r.getDouble(4) > 0.0)
    }
  }

  test("q183 market share: share = nation/total, bounded to [0,1]") {
    val rows = RelationalOps.q183.build(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nat = if (r.isNullAt(1)) 0.0 else r.getDouble(1)
      val tot = r.getDouble(2)
      assert(nat >= 0.0 && nat <= tot)
      if (!r.isNullAt(3)) {
        assert(r.getDouble(3) === nat / tot)
        assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      }
    }
  }

  test("q184 returned items: top-20 by revenue desc, one customer's revenue recomputed") {
    val rows = RelationalOps.q184.build(spark, sf).collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val revs = rows.map(_.getDouble(5))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    // brute-force the winner's revenue
    val top = rows.head
    val expect = Tables.lineitem(spark, sf)
      .filter(col("l_returnflag") === "R")
      .join(Tables.orders(spark, sf)
          .filter(year(col("o_orderdate")) === 1996),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_custkey") === top.getLong(0))
      .select((col("l_extendedprice").cast("decimal(12,4)") *
        (lit(1).cast("decimal(8,4)") - col("l_discount").cast("decimal(8,4)"))).as("v"))
      .agg(sum(col("v")).cast("decimal(18,4)").cast("double"))
      .head().getDouble(0)
    assert(top.getDouble(5) === expect)
  }

  test("q192 fk discovery: declared star FKs found, negative pair rejected") {
    val rows = RelationalOps.q192.build(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getBoolean(6))).toMap
    assert(rows.size === 6)
    val fkLike = rows.filter(_._2._6).keySet
    // the four real star FKs plus nationkey->nation are inclusion-1
    assert(fkLike.contains("lineitem.l_orderkey->orders.o_orderkey"))
    assert(fkLike.contains("orders.o_custkey->customer.c_custkey"))
    assert(fkLike.contains("customer.c_nationkey->nation.n_nationkey"))
    // the deliberate negative: nation keys are NOT region keys
    val neg = rows("customer.c_nationkey->region.r_regionkey")
    assert(!neg._6 && neg._5 < 0.5 && neg._4 > 0)
    rows.values.foreach { case (c, _, s, o, incl, fk) =>
      assert(s + o === c)
      assert(fk === (o === 0L))
      assert(incl === s.toDouble / c.toDouble)
    }
  }
}
