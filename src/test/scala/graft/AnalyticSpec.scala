package graft

import graft.operators.{AnalyticOps, DedupOps, SkewOps}
import graft.functions.TextOps
import org.apache.spark.sql.functions._

/** Invariant checks for the analytic-surface batch (q37–q52). Value-level
  * correctness is the DuckDB oracle's job; these pin the algebra. */
class AnalyticSpec extends SparkTestBase {

  test("q37 pivot: one row per nation; pivot cells sum to total revenue") {
    val piv = AnalyticOps.q37.build(spark, sf).cache()
    assert(piv.count() === Tables.nation(spark, sf).count())
    val cells = piv.select(
      (coalesce(col("p1_urgent"), lit(0.0)) + coalesce(col("p2_high"), lit(0.0)) +
        coalesce(col("p3_medium"), lit(0.0)) + coalesce(col("p4_notspec"), lit(0.0)) +
        coalesce(col("p5_low"), lit(0.0))).as("rowsum"))
      .agg(sum("rowsum")).head().getDouble(0)
    val total = Tables.orders(spark, sf)
      .agg(sum(col("o_totalprice").cast("decimal(18,4)")).cast("double"))
      .head().getDouble(0)
    assert(math.abs(cells - total) < 1e-4)
  }

  test("q38 unpivot: 3 long rows per wide row") {
    assert(AnalyticOps.q38.build(spark, sf).count() ===
      3 * Tables.lineitem(spark, sf).count())
  }

  test("q39 quantiles: monotone p25 <= p50 <= p75, all present") {
    AnalyticOps.q39.build(spark, sf).collect().foreach { r =>
      val (p25, p50, p75) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(p25 <= p50 && p50 <= p75)
    }
  }

  test("q40 scalar subquery: every kept order beats its customer average") {
    val out = AnalyticOps.q40.build(spark, sf)
    val avg = Tables.orders(spark, sf).groupBy("o_custkey")
      .agg((sum(col("o_totalprice").cast("decimal(18,4)")).cast("decimal(18,4)")
        .cast("double") / count(lit(1)).cast("double")).as("cavg"))
    val viol = out.join(avg, "o_custkey")
      .filter(col("o_totalprice") <= col("cavg")).count()
    assert(viol === 0)
    assert(out.count() > 0)
  }

  test("q41 full outer: covers every nation key on either side") {
    val keys = AnalyticOps.q41.build(spark, sf)
      .select("nationkey").collect().map(_.getLong(0)).toSet
    val ck = Tables.customer(spark, sf).select(col("c_nationkey").cast("long"))
      .distinct().collect().map(_.getLong(0)).toSet
    val sk = Tables.supplier(spark, sf).select(col("s_nationkey").cast("long"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(keys === (ck ++ sk))
  }

  test("q42 hash sample: deterministic across runs, ~5% rate") {
    val a = AnalyticOps.q42.build(spark, sf).collect().toSeq
    val b = AnalyticOps.q42.build(spark, sf).collect().toSeq
    assert(a === b)
    val frac = a.size.toDouble / Tables.lineitem(spark, sf).count()
    assert(frac > 0.02 && frac < 0.10)
  }

  test("q44 window battery: ntile in 1..4, percent_rank/cume_dist in [0,1]") {
    val bad = AnalyticOps.q44.build(spark, sf)
      .filter(col("nt") < 1 || col("nt") > 4 ||
        col("prk") < 0 || col("prk") > 1 ||
        col("cd") <= 0 || col("cd") > 1).count()
    assert(bad === 0)
  }

  test("q48 map explode: exactly 2 rows per sampled input row") {
    assert(AnalyticOps.q48.build(spark, sf).count() ===
      2 * AnalyticOps.q42.build(spark, sf).count())
  }

  test("q49 histogram: bucket counts cover all orders") {
    val n = AnalyticOps.q49.build(spark, sf).agg(sum("n")).head().getLong(0)
    assert(n === Tables.orders(spark, sf).count())
  }

  test("q50 contamination: ratios in [0,1]; eval split excluded") {
    val df = DedupOps.q50.build(spark, sf).cache()
    assert(df.filter(col("contamination") < 0 || col("contamination") > 1).count() === 0)
    assert(df.filter(col("doc_id") % 10 === 0).count() === 0)
  }

  test("q51 repetition: 0 <= rep_ratio < 1 and n_distinct <= n_total") {
    val df = TextOps.q51.build(spark, sf).cache()
    assert(df.filter(col("rep_ratio") < 0 || col("rep_ratio") >= 1).count() === 0)
    assert(df.filter(col("n_distinct") > col("n_total")).count() === 0)
  }

  test("q52 corpus stats: doc counts add up") {
    val n = TextOps.q52.build(spark, sf).agg(sum("n_docs")).head().getLong(0)
    assert(n === Tables.documents(spark, sf).count())
  }

  test("q53 tfidf: <=5 terms per doc, rank ordered by score desc") {
    val df = TextOps.q53.build(spark, sf).cache()
    assert(df.groupBy("doc_id").count().filter(col("count") > 5).count() === 0)
    // within a doc, rn order must match non-increasing tfidf
    val viol = df.alias("a").join(df.alias("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.rn") === col("b.rn") - 1)
      .filter(col("a.tfidf") < col("b.tfidf")).count()
    assert(viol === 0)
  }

  test("q54 inverted index: df equals posting-list length; docs resolvable") {
    val df = TextOps.q54.build(spark, sf).cache()
    val viol = df.filter(
      size(split(col("postings"), ",")) =!= col("df_docs")).count()
    assert(viol === 0)
    assert(df.agg(max("df_docs")).head().getLong(0) <=
      Tables.documents(spark, sf).count())
  }

  test("q55 cross-source dedup: keepers partition the corpus") {
    val df = DedupOps.q55.build(spark, sf).cache()
    assert(df.agg(sum("n_docs")).head().getLong(0) ===
      Tables.documents(spark, sf).count())
    assert(df.select("dig").distinct().count() === df.count())
  }

  test("salted join: identical rows to the plain join, any salt count") {
    import graft.operators.SkewOps
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_linenumber", "l_partkey")
    val p = Tables.part(spark, sf).select("p_partkey", "p_name")
    val plain = li.join(p, col("l_partkey") === col("p_partkey"))
    for (n <- Seq(1, 4, 16)) {
      val salted = SkewOps.saltedJoin(li, p, "l_partkey", "p_partkey", n)
      assert(salted.exceptAll(plain).count() === 0, s"extra rows at n=$n")
      assert(plain.exceptAll(salted).count() === 0, s"missing rows at n=$n")
    }
  }

  test("q59 date spine: contiguous months, zero-filled gaps kept") {
    val rows = AnalyticOps.q59.build(spark, sf).collect()
    val months = rows.map(_.getDate(0).toLocalDate).toList
    months.zip(months.drop(1)).foreach { case (a, b) =>
      assert(a.plusMonths(1) === b, s"gap between $a and $b")
    }
    assert(rows.map(_.getLong(1)).sum === Tables.orders(spark, sf).count())
  }

  test("q62 hll sketches: estimates match exact counts at fixture scale") {
    // customer keys are unique -> per-nation cardinalities are small and
    // HLL is exact in its sparse regime; the global union row (-1) too
    val bad = AnalyticOps.q62.build(spark, sf)
      .filter(abs(col("estimate") - col("exact")) / col("exact") > 0.05)
      .count()
    assert(bad === 0)
  }

  test("q66 connected components: endpoints share a cluster, label is min member") {
    import spark.implicits._
    // hand graph: clique {1,2,3}, chain 4-5, singleton pair 8-9
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (8L, 9L))
      .toDF("a_doc", "b_doc")
    val labels = DedupOps.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L,
      8L -> 8L, 9L -> 8L))
    // every q30 edge must connect same-cluster docs
    val out = DedupOps.q66.build(spark, sf).select("doc_id", "cluster_id")
    val e = DedupOps.q30.build(spark, sf).select("a_doc", "b_doc")
    val viol = e
      .join(out.withColumnRenamed("doc_id", "a_doc").withColumnRenamed("cluster_id", "ca"), "a_doc")
      .join(out.withColumnRenamed("doc_id", "b_doc").withColumnRenamed("cluster_id", "cb"), "b_doc")
      .filter(col("ca") =!= col("cb")).count()
    assert(viol === 0)
  }

  test("connected components converges on a 200-node path (pointer jumping)") {
    import spark.implicits._
    // a path is the worst case for plain min-label propagation
    // (O(diameter) rounds — 199 here, past the 64-round bound); pointer
    // jumping must close it in O(log d)
    val pairs = (1L until 200L).map(i => (i, i + 1))
      .toDF("a_doc", "b_doc")
    val labels = DedupOps.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size === 200)
    assert(labels.values.forall(_ == 1L))
  }

  test("q56 edit-distance dedup: symmetric-free pairs, dist within bound") {
    val df = DedupOps.q56.build(spark, sf).cache()
    assert(df.filter(col("a_doc") >= col("b_doc")).count() === 0)
    assert(df.filter(col("dist") < 0 || col("dist") > 16).count() === 0)
  }

  test("q75 zscore outliers: all beyond 2 sigma, and a small minority") {
    val df = AnalyticOps.q75.build(spark, sf).cache()
    assert(df.filter(abs(col("z")) <= 2).count() === 0)
    val total = Tables.events(spark, sf).count()
    // Chebyshev bound: at most 1/4 of any distribution sits beyond 2 sigma
    assert(df.count() <= total / 4)
    assert(df.count() > 0)
  }

  test("q104 winsorize: clipped values inside [p05, p95], ~10% clipped, order stats real") {
    val df = AnalyticOps.q104.build(spark, sf).cache()
    assert(df.count() === Tables.events(spark, sf).count())
    // clipping touches exactly the flagged rows
    assert(df.filter(!col("was_clipped") && col("clipped") =!= col("value")).count() === 0)
    assert(df.filter(col("was_clipped") && col("clipped") === col("value")).count() === 0)
    // clipping rate per group is ~10% (p05 + p95 tails), never > 12%
    val rates = df.groupBy("event_type")
      .agg((sum(when(col("was_clipped"), 1).otherwise(0)).cast("double") /
        count(lit(1)).cast("double")).as("r")).collect()
    rates.foreach(r => assert(r.getDouble(1) > 0.03 && r.getDouble(1) < 0.12,
      s"${r.getString(0)} rate ${r.getDouble(1)}"))
    // every clip bound is an actual data value of its group (order statistic)
    val bounds = df.filter(col("was_clipped")).select("event_type", "clipped").distinct()
    val missing = bounds.join(
      Tables.events(spark, sf).select(col("event_type"), col("value").as("clipped")),
      Seq("event_type", "clipped"), "left_anti")
    assert(missing.count() === 0)
  }

  test("q114 ab test: arms partition users, z row consistent with arm rates") {
    val df = AnalyticOps.q114.build(spark, sf).cache()
    val rows = df.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows(0L)._1 + rows(1L)._1 === users)
    assert(rows(-1L)._1 === users)
    assert(rows(-1L)._2 === rows(0L)._2 + rows(1L)._2)
    // recompute z from the arm rows
    val (n0, x0, _) = rows(0L); val (n1, x1, _) = rows(1L)
    val (p0, p1) = (x0.toDouble / n0, x1.toDouble / n1)
    val pp = (x0 + x1).toDouble / (n0 + n1)
    val z = (p0 - p1) / math.sqrt(pp * (1 - pp) * (1.0 / n0 + 1.0 / n1))
    assert(math.abs(rows(-1L)._3 - z) < 1e-12)
  }

  test("q115 gini: deciles cover all customers, shares sum to 1, gini in [0,1)") {
    val df = AnalyticOps.q115.build(spark, sf).cache()
    assert(df.count() === 10)
    val customers = Tables.orders(spark, sf).select("o_custkey").distinct().count()
    assert(df.agg(sum("n_cust")).head().getLong(0) === customers)
    assert(math.abs(df.agg(sum("spend_share")).head().getDouble(0) - 1.0) < 1e-9)
    val gini = df.select("gini").head().getDouble(0)
    assert(gini >= 0.0 && gini < 1.0)
    // Lorenz: later deciles (sorted ascending by spend) hold larger shares
    val shares = df.orderBy("decile").collect().map(_.getDouble(3))
    // top decile strictly exceeds an equal share
    assert(shares.last > 0.1)
  }

  test("q111 psi: 10 bins, fractions normalize, contribs non-negative-ish") {
    val df = AnalyticOps.q111.build(spark, sf).cache()
    assert(df.count() === 10)
    // smoothed fractions each sum to 1 exactly (Laplace over 10 bins)
    val (ps, qs) = (df.agg(sum("p")).head().getDouble(0),
      df.agg(sum("q")).head().getDouble(0))
    assert(math.abs(ps - 1.0) < 1e-9 && math.abs(qs - 1.0) < 1e-9)
    // (q-p)*ln(q/p) is non-negative up to the 6dp ln rounding slack
    assert(df.filter(col("contrib") < -1e-6).count() === 0)
    // counts cover the whole corpus
    val total = df.agg(sum(col("n_ref") + col("n_cur"))).head().getLong(0)
    assert(total === Tables.events(spark, sf).count())
  }

  test("q108 rfm: quartiles balanced, one row per ordering customer") {
    val df = AnalyticOps.q108.build(spark, sf).cache()
    val customers = Tables.orders(spark, sf).select("o_custkey").distinct().count()
    assert(df.count() === customers)
    // ntile(4) balance: bucket sizes differ by at most 1
    for (c <- Seq("r_score", "f_score", "m_score")) {
      val sizes = df.groupBy(c).count().collect().map(_.getLong(1))
      assert(sizes.length === 4)
      assert(sizes.max - sizes.min <= 1, s"$c unbalanced: ${sizes.mkString(",")}")
    }
    // monetary score 1 customers all outspend score 4 customers
    val topMin = df.filter(col("m_score") === 1).agg(min("m")).head().getDouble(0)
    val botMax = df.filter(col("m_score") === 4).agg(max("m")).head().getDouble(0)
    assert(topMin >= botMax)
  }

  test("q109 basket pairs: supports descending, pairs real co-orders") {
    val df = AnalyticOps.q109.build(spark, sf).cache()
    assert(df.count() === 50)
    val supports = df.orderBy("rank").collect().map(_.getLong(2))
    assert(supports.zip(supports.tail).forall { case (a, b) => a >= b })
    // the top pair genuinely co-occurs in that many orders
    val top = df.filter(col("rank") === 1).head()
    val (pa, pb) = (top.getLong(0), top.getLong(1))
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey").distinct()
    val co = li.filter(col("l_partkey") === pa).select("l_orderkey")
      .intersect(li.filter(col("l_partkey") === pb).select("l_orderkey")).count()
    assert(co === top.getLong(2))
  }

  test("q96 constraints: all six checks pass on the fixture, metrics exact") {
    val df = AnalyticOps.q96.build(spark, sf).cache()
    assert(df.count() === 6)
    assert(df.filter(!col("passed")).count() === 0)
    val m = df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("orders_rowcount") === Tables.orders(spark, sf).count().toDouble)
    assert(m("orders_key_unique") === 1.0)
    assert(m("orders_custkey_complete") === 1.0)
    assert(m("lineitem_qty_range") === 1.0)
    assert(m("lineitem_fk_orders") === 0.0)
  }

  test("q118 OLS: slope/intercept match a driver-side exact fit per nation") {
    val df = AnalyticOps.q118.build(spark, sf).cache()
    assert(df.count() > 0)
    // recompute yearly revenue per nation on the driver
    val y0 = Tables.orders(spark, sf)
      .agg(min(year(col("o_orderdate")).cast("long"))).head().getLong(0)
    val yearly = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sf).select("n_nationkey", "n_name"),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), (year(col("o_orderdate")).cast("long") - y0).as("x"))
      .agg(sum(col("o_totalprice").cast("decimal(18,4)")).as("y"))
      .collect().groupBy(_.getString(0))
    df.collect().foreach { r =>
      val pts = yearly(r.getString(0))
        .map(p => (p.getLong(1), p.getDecimal(2)))
      val n = pts.length.toDouble
      assert(r.getLong(1) === pts.length)
      val sx = pts.map(_._1).sum.toDouble
      val sxx = pts.map(p => p._1 * p._1).sum.toDouble
      val sy = pts.map(_._2.doubleValue()).sum
      val sxy = pts.map(p => p._2.doubleValue() * p._1).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(math.abs(r.getDouble(3) - slope) <= 1e-6 * math.abs(slope) + 1e-6)
      val intercept = (sy - slope * sx) / n
      assert(math.abs(r.getDouble(4) - intercept) <=
        1e-6 * math.abs(intercept) + 1e-6)
    }
  }

  test("q120 profile: counts reconcile, entropy bounded, mode is the max") {
    val df = AnalyticOps.q120.build(spark, sf).cache()
    assert(df.count() === 3)
    val total = Tables.documents(spark, sf).count()
    df.collect().foreach { r =>
      assert(r.getLong(1) + r.getLong(2) === total)
      // 0 <= H <= ln(n_distinct) (+ fixed-point slack)
      assert(r.getDouble(6) >= -1e-6)
      assert(r.getDouble(6) <= math.log(r.getLong(3).toDouble) + 1e-6)
    }
    // lang mode really is the most frequent lang (count checked too)
    val langRow = df.filter(col("col_name") === "lang").head()
    val top = Tables.documents(spark, sf).groupBy("lang").count()
      .orderBy(col("count").desc, col("lang").asc).head()
    assert(langRow.getString(4) === top.getString(0))
    assert(langRow.getLong(5) === top.getLong(1))
    // n_chars column: near-unique values => entropy close to ln(n_distinct)
    val nc = df.filter(col("col_name") === "n_chars").head()
    assert(nc.getLong(3) > 1)
  }

  test("q123 benford: digit counts partition the orders, freqs sum to 1") {
    val df = AnalyticOps.q123.build(spark, sf).cache()
    val rows = df.collect()
    assert(rows.forall(r => r.getLong(0) >= 1 && r.getLong(0) <= 9))
    assert(rows.map(_.getLong(1)).sum === Tables.orders(spark, sf).count())
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-12)
    // expected column is the Benford pmf (sums to 1 up to 6dp rounding)
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-5)
    // dev = freq - expected, re-derivable
    assert(rows.forall(r =>
      math.abs(r.getDouble(4) - (r.getDouble(2) - r.getDouble(3))) < 1e-15))
  }

  test("q124 skyline: equals the brute-force dominance frontier") {
    val df = AnalyticOps.q124.build(spark, sf).cache()
    val pts = Tables.orders(spark, sf).groupBy("o_custkey")
      .agg(max(col("o_totalprice").cast("decimal(18,4)")).as("mx"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getDecimal(1), r.getLong(2)))
    val sky = pts.filter { case (_, mx, n) =>
      !pts.exists { case (_, qm, qn) =>
        qm.compareTo(mx) >= 0 && qn >= n &&
          (qm.compareTo(mx) > 0 || qn > n)
      }
    }.map(_._1).toSet
    assert(df.collect().map(_.getLong(0)).toSet === sky)
    // frontier is an anti-chain: sorted by best_order desc, counts never fall
    // (equal only for exact (best_order, n) ties, which both survive)
    val ordered = df.orderBy(col("best_order").desc).collect().map(_.getLong(2))
    assert(ordered.zip(ordered.tail).forall { case (a, b) => a <= b })
  }

  test("q129 mutual info: cells partition the corpus, lift recomputes, MI >= 0") {
    val df = AnalyticOps.q129.build(spark, sf).cache()
    val docs = Tables.documents(spark, sf)
    val total = docs.count()
    val rows = df.collect()
    assert(rows.map(_.getLong(2)).sum === total)
    // lift recomputes from the raw (lang, source) contingency table
    val byLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bySrc = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val expect = (r.getLong(2).toDouble * total) /
        (byLang(r.getString(0)).toDouble * bySrc(r.getString(1)))
      assert(math.abs(r.getDouble(3) - expect) < 1e-12)
    }
    // one corpus-level MI on every row; non-negative up to fixed-point slack
    val mis = rows.map(_.getDouble(4)).distinct
    assert(mis.length === 1)
    assert(mis.head >= -1e-6)
    // MI <= min(H(lang), H(source)) bound (natural log)
    def entropy(m: Map[String, Long]): Double = {
      val n = m.values.sum.toDouble
      -m.values.map(c => c / n * math.log(c / n)).sum
    }
    assert(mis.head <= math.min(entropy(byLang), entropy(bySrc)) + 1e-6)
  }

  test("q131 auc: brute-force pairwise Mann–Whitney recompute, counts partition") {
    val df = AnalyticOps.q131.build(spark, sf).cache()
    val ev = Tables.events(spark, sf).select(col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val total = ev.length.toLong
    df.collect().foreach { r =>
      assert(r.getLong(1) + r.getLong(2) === total)
      val auc = r.getDouble(3)
      assert(auc >= 0.0 && auc <= 1.0)
      // wins + half-ties over every pos×neg pair — the definition the
      // histogram rank-sum must reproduce exactly
      val pos = ev.filter(_._1 == r.getString(0)).map(_._2)
      val neg = ev.filter(_._1 != r.getString(0)).map(_._2)
      var num = 0.0
      for (p <- pos; n <- neg)
        num += (if (p > n) 1.0 else if (p == n) 0.5 else 0.0)
      assert(math.abs(auc - num / (pos.length.toDouble * neg.length)) < 1e-12)
    }
  }

  test("q135 calibration: bins partition events, ECE matches brute force") {
    val df = AnalyticOps.q135.build(spark, sf).cache()
    val ev = Tables.events(spark, sf)
      .select(round(col("value") * 100, 0).cast("long"),
        (col("event_type") === "purchase").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val maxc = ev.map(_._1).max
    val rows = df.collect()
    assert(rows.map(_.getLong(1)).sum === ev.length.toLong)
    var eceNum = 0L
    rows.foreach { r =>
      val bin = r.getLong(0)
      val in = ev.filter(e => math.min(e._1 * 10 / maxc, 9L) == bin)
      val pos = in.map(_._2).sum
      assert(r.getLong(1) === in.length.toLong)
      assert(r.getLong(2) === pos)
      assert(math.abs(r.getDouble(3) -
        in.map(_._1).sum.toDouble / (in.length.toDouble * maxc)) < 1e-12)
      assert(math.abs(r.getDouble(4) - pos.toDouble / in.length) < 1e-12)
      eceNum += math.abs(pos * maxc - in.map(_._1).sum)
    }
    val ece = eceNum.toDouble / (maxc.toDouble * ev.length)
    rows.foreach(r => assert(math.abs(r.getDouble(5) - ece) < 1e-12))
    // ECE is a mean of per-bin |acc - conf| gaps, each in [0, 1]
    assert(ece >= 0.0 && ece <= 1.0)
  }

  test("q136 chi2: matches brute-force contingency recompute, V in [0,1]") {
    val df = AnalyticOps.q136.build(spark, sf)
    val r = df.head()
    val docs = Tables.documents(spark, sf).select("lang", "source")
      .collect().map(d => (d.getString(0), d.getString(1)))
    val n = docs.length.toLong
    val rm = docs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cm = docs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val chi2 = docs.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((l, s2), o) =>
        val num = n * o - rm(l) * cm(s2)
        BigDecimal(num.toDouble * num / (n.toDouble * rm(l) * cm(s2)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble
    assert(r.getLong(0) === n)
    assert(r.getLong(1) === (rm.size - 1).toLong * (cm.size - 1))
    assert(math.abs(r.getDouble(2) - chi2) < 1e-9)
    val v = math.sqrt(chi2 / (n.toDouble * math.min(rm.size - 1, cm.size - 1)))
    assert(math.abs(r.getDouble(3) - v) < 1e-12)
    assert(v >= 0.0 && v <= 1.0)
  }

  test("q139 mad: rank-median recompute, outliers beyond 3 MADs") {
    val df = AnalyticOps.q139.build(spark, sf).cache()
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), round(col("value") * 100, 0).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    df.collect().foreach { r =>
      val cents = ev.filter(_._1 == r.getString(0)).map(_._2).sorted
      val n = cents.length
      assert(r.getLong(1) === n.toLong)
      // lower-median rank device: value at rank ceil(n/2)
      val med = cents(math.ceil(n * 0.5).toInt - 1)
      assert(math.abs(r.getDouble(2) - med / 100.0) < 1e-12)
      val devs = cents.map(c => math.abs(c - med)).sorted
      val mad = devs(math.ceil(n * 0.5).toInt - 1)
      assert(math.abs(r.getDouble(3) - mad / 100.0) < 1e-12)
      assert(r.getLong(4) === devs.count(_ > 3 * mad).toLong)
      // robustness sanity: at most half the rows can sit beyond the MAD
      assert(r.getLong(4) <= n / 2)
    }
  }

  test("q141 incremental rollup: merged partials equal direct aggregate, split real") {
    val df = AnalyticOps.q141.build(spark, sf).cache()
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), expr("ts div 1000000000 div 86400"),
        round(col("value") * 100, 0).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val cutover = ev.map(_._2).min + 21L
    // the split must genuinely exercise the merge: both sides non-empty
    assert(ev.exists(_._2 < cutover) && ev.exists(_._2 >= cutover))
    df.collect().foreach { r =>
      val in = ev.filter(_._1 == r.getString(0)).map(_._3)
      assert(r.getLong(1) === in.length.toLong)
      assert(r.getLong(2) === in.sum)
      assert(r.getLong(3) === in.min)
      assert(r.getLong(4) === in.max)
      assert(math.abs(r.getDouble(5) - in.sum.toDouble / (in.length * 100.0)) < 1e-12)
    }
  }

  test("q142 audience overlap: matches per-type user-set intersections") {
    val df = AnalyticOps.q142.build(spark, sf).cache()
    val ev = Tables.events(spark, sf).select("event_type", "user_id")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val sets = ev.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val types = sets.keys.toSeq.sorted
    assert(df.count() === (types.length * (types.length - 1) / 2).toLong)
    df.collect().foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a < b)
      val both = (sets(a) & sets(b)).size.toLong
      assert(r.getLong(2) === sets(a).size.toLong)
      assert(r.getLong(3) === sets(b).size.toLong)
      assert(r.getLong(4) === both)
      assert(math.abs(r.getDouble(5) -
        both.toDouble / (sets(a).size + sets(b).size - both)) < 1e-12)
    }
  }

  test("q144 lateral top-n: per-customer top-3 orders, decorrelated plan") {
    val df = AnalyticOps.q144.build(spark, sf).cache()
    val orders = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expect = orders.groupBy(_._1).view.mapValues { rows =>
      rows.sortBy(r => (-r._3, r._2)).take(3).map(r => (r._2, r._3)).toSeq
    }.toMap
    val got = df.collect().groupBy(_.getLong(0))
    assert(got.keySet === expect.filter(_._2.nonEmpty).keySet)
    got.foreach { case (ck, rows) =>
      assert(rows.toSeq.map(r => (r.getLong(1), r.getDouble(2))) === expect(ck))
    }
    // Catalyst must decorrelate: the optimized plan has no lateral join
    assert(!df.queryExecution.optimizedPlan.toString.contains("LateralJoin"))
  }

  test("q145 bloom prefilter join: bit-identical to the plain join") {
    val df = SkewOps.q145.build(spark, sf).cache()
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf)
          .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .agg(count(lit(1)).as("n_items"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    assert(df.count() === plain.size.toLong)
    df.collect().foreach { r =>
      assert(r.getLong(1) === plain(r.getDate(0).toString))
      assert(r.getLong(2) >= r.getLong(1)) // qty >= count (quantities >= 1)
      assert(r.getDouble(3) > 0.0)
    }
  }

  test("bloomMightContain: no false negatives, fp rate bounded") {
    import spark.implicits._
    val keys = spark.range(0, 2000).toDF("k")
    val mc = SkewOps.bloomMightContain(keys, "k", col("id"))
    val probed = spark.range(0, 100000).filter(mc).select("id")
      .as[Long].collect().toSet
    assert((0L until 2000L).forall(probed.contains)) // zero false negatives
    val fp = probed.count(_ >= 2000L).toDouble / 98000.0
    assert(fp < 0.05, s"false-positive rate $fp") // default fpp is 3%
  }

  test("q148 fan-out audit: histogram masses reconcile with both tables") {
    val df = AnalyticOps.q148.build(spark, sf).cache()
    val fans = Tables.lineitem(spark, sf).select("l_orderkey")
      .collect().map(_.getLong(0))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val orderKeys = Tables.orders(spark, sf).select("o_orderkey")
      .collect().map(_.getLong(0))
    val expect = orderKeys.map(k => fans.getOrElse(k, 0L))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expect)
    // the histogram must account for every order exactly once
    assert(got.values.sum === orderKeys.length.toLong)
  }

  test("q149 weighted sample: membership exactly hash*maxc < w*1e6") {
    val df = AnalyticOps.q149.build(spark, sf).cache()
    def res(s: String, m: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.substring(0, 15), 16) % m
    }
    val docs = Tables.documents(spark, sf).select("doc_id", "n_chars")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val maxc = docs.map(_._2).max
    val expect = docs.filter { case (id, w) =>
      res(s"pps:$id", 1000000L) * maxc < w * 1000000L
    }.map(_._1).toSet
    val got = df.collect().map(_.getLong(0)).toSet
    assert(got === expect)
    // longest docs are always kept (p = 1)
    assert(docs.filter(_._2 == maxc).map(_._1).forall(got.contains))
    df.collect().foreach(r =>
      assert(math.abs(r.getDouble(3) - r.getLong(2).toDouble / maxc) < 1e-12))
  }

  test("q153 ks: matches a driver brute-force supremum over the value grid") {
    val df = AnalyticOps.q153.build(spark, sf).cache()
    val ev = Tables.events(spark, sf).select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val n = ev.length.toLong
    val grid = ev.map(_._2).distinct.sorted
    val byVal = ev.groupBy(_._2)
    assert(df.count() === ev.map(_._1).distinct.length)
    df.collect().foreach { r =>
      val t = r.getString(0)
      val nt = ev.count(_._1 == t).toLong
      assert(r.getLong(1) === nt && r.getLong(2) === n - nt)
      var best = -1L; var bestAt = Double.NaN
      var cumT = 0L; var cumAll = 0L
      grid.foreach { v =>
        cumT += byVal(v).count(_._1 == t)
        cumAll += byVal(v).length
        val num = math.abs(cumT * (n - nt) - (cumAll - cumT) * nt)
        if (num > best) { best = num; bestAt = v }
      }
      assert(r.getLong(3) === best)
      assert(r.getDouble(4) === best.toDouble / (nt * (n - nt)).toDouble)
      assert(r.getDouble(5) === bestAt)
    }
  }

  test("q156 bootstrap: driver recompute of Poisson weights and replicate band") {
    val df = AnalyticOps.q156.build(spark, sf).cache()
    val o = Tables.orders(spark, sf)
      .select("o_orderpriority", "o_orderkey", "o_totalprice").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    def residue(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 1000000007L
    }
    val cuts = Seq(367879443L, 735758887L, 919698609L, 981011849L)
    def wOf(u: Long): Long = cuts.indexWhere(u < _) match {
      case -1 => 4L; case i => i.toLong
    }
    df.collect().foreach { r =>
      val p = r.getString(0)
      val rows = o.filter(_._1 == p)
      assert(r.getLong(1) === rows.length.toLong)
      // exact-integer device: prices as 1e-4 units, half-up 6dp integer mean
      def units(v: Double): Long =
        (BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP) * 10000)
          .toLongExact
      val means = (1 to 16).map { b =>
        var n = 0L
        var sU = 0L
        rows.foreach { case (_, k, v) =>
          val w = wOf(residue(s"$k:$b"))
          n += w
          sU += w * units(v)
        }
        ((2L * sU * 100L + n) / (2L * n), b) // mean in 1e-6 units, half-up
      }.sorted
      assert(r.getDouble(3) === means(1)._1.toDouble / 1e6)  // rank 2
      assert(r.getDouble(4) === means(14)._1.toDouble / 1e6) // rank 15
      assert(means(1)._1 < means(14)._1) // a real band
      val sumU = rows.map { case (_, _, v) => units(v) }.sum
      assert(r.getDouble(2) ===
        sumU.toDouble / (rows.length.toLong * 10000L).toDouble)
    }
  }

  test("q159 ratio report: shares telescope to 1; revenue reconciles") {
    val df = AnalyticOps.q159.build(spark, sf).cache()
    df.groupBy("o_orderpriority").agg(sum("share_of_priority").as("s"))
      .collect().foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9))
    assert(math.abs(
      df.agg(sum("share_of_total")).head().getDouble(0) - 1.0) < 1e-9)
    val direct = Tables.orders(spark, sf)
      .agg(sum(col("o_totalprice").cast("decimal(18,4)"))).head().getDecimal(0)
    val total = df.agg(sum(col("rev").cast("decimal(18,4)"))).head().getDecimal(0)
    assert(total.compareTo(direct) === 0)
  }

  test("q160 pop growth: contiguous spine, telescoping MoM, YoY recompute") {
    val rows = AnalyticOps.q160.build(spark, sf).collect()
    val mis = rows.map(r => r.getLong(0) * 12 + r.getLong(1) - 1)
    assert(mis.zip(mis.tail).forall(p => p._2 == p._1 + 1)) // no gaps
    val revs = rows.map(_.getDouble(3))
    val deltas = rows.drop(1).map(_.getDouble(4))
    assert(math.abs(deltas.sum - (revs.last - revs.head)) < 1e-6)
    rows.zipWithIndex.foreach { case (r, i) =>
      if (i >= 12 && revs(i - 12) != 0.0)
        assert(math.abs(r.getDouble(5) - revs(i) / revs(i - 12)) < 1e-12)
      else assert(r.isNullAt(5))
    }
    assert(rows.map(_.getLong(2)).sum === Tables.orders(spark, sf).count())
  }

  test("q161 equidepth hist: balanced bins, ordered edges, totals reconcile") {
    val rows = AnalyticOps.q161.build(spark, sf).collect()
    val n = Tables.orders(spark, sf).count()
    assert(rows.length === 10)
    assert(rows.map(_.getLong(1)).sum === n)
    rows.foreach(r => assert(math.abs(r.getLong(1) - n / 10) <= 1))
    rows.foreach(r => assert(r.getDouble(2) <= r.getDouble(3))) // lo <= hi
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getDouble(3) <= b.getDouble(2)) // no overlap
      case _ =>
    }
  }

  test("q166 boxplot: quartiles and fences match a driver recompute") {
    val rows = AnalyticOps.q166.build(spark, sf).collect()
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), round(col("value") * 100, 0).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(rows.map(_.getString(0)).toSet === ev.keySet)
    rows.foreach { r =>
      val cs = ev(r.getString(0))
      val n = cs.length.toLong
      def at(p: Long) = cs(((n * p + 99) / 100).toInt - 1)
      assert(r.getLong(1) === n)
      assert(r.getLong(2) === cs.head && r.getLong(6) === cs.last)
      assert(r.getLong(3) === at(25) && r.getLong(4) === at(50) &&
        r.getLong(5) === at(75))
      val iqr = at(75) - at(25)
      assert(r.getLong(7) === iqr)
      val out = cs.count(c => c * 2 < at(25) * 2 - iqr * 3 ||
        c * 2 > at(75) * 2 + iqr * 3).toLong
      assert(r.getLong(8) === out)
    }
  }

  test("q190 bitmap distinct: equals countDistinct per day") {
    val got = AnalyticOps.q190.build(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expect = Tables.events(spark, sf)
      .select(expr("ts div 1000000000 div 86400").as("day"), col("user_id"))
      .groupBy("day")
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("u"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === expect)
  }

  test("q197 grouping sets: levels telescope to the same total; one Expand pass") {
    val df = AnalyticOps.q197.build(spark, sf).cache()
    val byLvl = df.groupBy("lvl").agg(sum("n").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = Tables.orders(spark, sf).count()
    // every grouping level partitions the same fact set
    assert(byLvl === Map(0L -> total, 1L -> total, 2L -> total, 3L -> total))
    // one scan: the sets come from ONE Expand + aggregate, not per-set re-scans
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"))
    assert("FileScan|Scan parquet".r.findAllIn(plan).size <= 1 ||
      plan.contains("InMemory")) // cached: the point is no 4x scan fan-out
    df.unpersist()
  }

  test("q198 lateral top-k: decorrelates to a PARTITIONED window; " +
    "equals the native per-key top-k") {
    val df = AnalyticOps.q198.build(spark, sf)
    val rows = df.collect()
    // 25 nations x up to 3 customers
    assert(rows.length === 75)
    // Catalyst must rewrite the correlated LIMIT into a window
    // partitioned by the correlation key — never an unpartitioned sort
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    def nodes(p: SparkPlan): Seq[SparkPlan] =
      p +: (p match {
        case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
        case q: QueryStageExec        => nodes(q.plan)
        case o                        => o.children.flatMap(nodes)
      })
    val ns = nodes(df.queryExecution.executedPlan)
    assert(ns.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w }.isEmpty)
    assert(ns.exists {
      case w: WindowExec => w.partitionSpec.nonEmpty
      case w: WindowGroupLimitExec => w.partitionSpec.nonEmpty
      case _ => false
    }, "expected a partitioned window/group-limit from decorrelation")
    // value parity with the hand-built partitioned-window top-k
    import org.apache.spark.sql.expressions.Window
    val nat = Tables.customer(spark, sf).join(
        Tables.nation(spark, sf),
        col("c_nationkey") === col("n_nationkey"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("n_nationkey")
          .orderBy(col("c_acctbal").desc, col("c_name").asc)))
      .filter(col("rk") <= 3)
      .select("n_name", "c_name", "c_acctbal")
      .orderBy(col("n_name"), col("c_acctbal").desc, col("c_name"))
      .collect()
    assert(rows.toSeq === nat.toSeq)
  }

  test("q200 EXISTS/NOT EXISTS waiters: decorrelated to semi + anti joins, " +
    "no per-row re-scan") {
    val df = AnalyticOps.q200.build(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // counts are per-(supplier, qualifying lineitem): numwait sums to
    // the number of qualifying l1 rows, each counted exactly once
    assert(rows.map(_.getLong(1)).sum > 0)
    // RewritePredicateSubquery must plan LEFT SEMI (EXISTS) and LEFT
    // ANTI (NOT EXISTS) joins; a correlated re-execution would surface
    // as a subquery node per outer row instead
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"no semi join in plan:\n$plan")
    assert(plan.contains("LeftAnti"), s"no anti join in plan:\n$plan")
    // the optimized logical plan carries no residual correlated
    // predicate subqueries
    val lp = df.queryExecution.optimizedPlan.toString
    assert(!lp.contains("exists#"), "EXISTS survived decorrelation")
  }

  test("q201 correlated scalar aggregates: decorrelated to joined " +
    "aggregates; threshold is exact integer arithmetic") {
    val df = AnalyticOps.q201.build(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // decorrelation: no ScalarSubquery left in the optimized plan — the
    // per-partkey aggregates become standalone subtrees joined back
    val lp = df.queryExecution.optimizedPlan.toString
    assert(!lp.contains("scalar-subquery"),
      s"scalar subquery survived decorrelation:\n$lp")
    // value parity with a direct two-aggregate formulation
    val li = Tables.lineitem(spark, sf)
    val perPart = li.groupBy("l_partkey").agg(
      count(lit(1)).as("cnt"),
      sum(col("l_quantity").cast("long")).as("qsum"))
    val expect = li.join(Tables.part(spark, sf),
        col("p_partkey") === col("l_partkey"))
      .join(perPart, "l_partkey")
      .filter(lit(5L) * col("l_quantity").cast("long") * col("cnt") < col("qsum"))
      .groupBy("p_brand").agg(count(lit(1)).as("n_small"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(r => r.getString(0) -> r.getLong(1)).toMap === expect)
  }

  test("q204 global scalar + NOT EXISTS: anti join planned, cutoff exact") {
    val df = AnalyticOps.q204.build(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"no anti join in plan:\n$plan")
    // the integer cutoff equals the float-free definition: strictly
    // above the mean of positive balances
    val c = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_nationkey"),
        (col("c_acctbal").cast("decimal(18,4)") * 10000).cast("long").as("u"))
    val pos = c.filter(col("u") > 0)
      .agg(count(lit(1)).as("n"), sum("u").as("s")).collect().head
    val urgent = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).distinct()
    val expect = c.join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .filter(col("u") * lit(pos.getLong(0)) > lit(pos.getLong(1)))
      .groupBy("c_nationkey").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rows.map(r => r.getInt(0) -> r.getLong(1)).toMap === expect)
  }
}
