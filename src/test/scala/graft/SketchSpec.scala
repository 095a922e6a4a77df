package graft

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

import graft.operators.AnalyticOps

/** Sketch guarantees the oracle can't state: count-min one-sided error
  * + linear mergeability, and GK percentile rank bounds. */
class SketchSpec extends SparkTestBase {

  test("q90 CMS estimates: one-sided error bound holds on every row") {
    val rows = AnalyticOps.q90.build(spark, sf).collect()
    assert(rows.length == 50, "5 langs x top-10")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_bound"),
        s"${r.getAs[String]("lang")}/${r.getAs[String]("tok")}: " +
          s"est ${r.getAs[Long]("cms_est")} vs exact ${r.getAs[Long]("exact_cnt")}")
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("exact_cnt"),
        "CMS never underestimates")
    }
  }

  test("CMS sketches are linear: per-source merge == corpus-wide sketch") {
    val toks = graft.functions.TextOps
      .tokensWithPos(Tables.documents(spark, sf)
        .withColumn("source", col("lang"))) // any partitioning works; reuse lang
    def sketchOf(df: org.apache.spark.sql.DataFrame): CountMinSketch =
      CountMinSketch.readFrom(
        df.agg(count_min_sketch(col("tok"), lit(0.001d), lit(0.99d), lit(42)))
          .head().getAs[Array[Byte]](0))
    val whole = sketchOf(toks)
    val langs = toks.select("lang").distinct().collect().map(_.getString(0))
    val merged = langs.map(l => sketchOf(toks.filter(col("lang") === l)))
      .reduce { (a, b) => a.mergeInPlace(b); a }
    // linearity: same dims + same seed => counting arrays add, so every
    // estimate agrees exactly
    val probe = toks.groupBy("tok").count()
      .orderBy(desc("count")).limit(100).collect()
    probe.foreach { r =>
      val t = r.getString(0)
      assert(whole.estimateCount(t) == merged.estimateCount(t),
        s"merge drift on token '$t'")
    }
  }

  test("q91 approx percentiles sit inside the guaranteed rank band") {
    val got = AnalyticOps.q91.build(spark, sf).collect()
    val acc = 10000.0
    got.foreach { r =>
      val pri = r.getString(0)
      val vals = Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === pri)
        .select("o_totalprice").collect().map(_.getDouble(0)).sorted
      val n = vals.length
      for ((p, v) <- Seq(0.5 -> r.getDouble(1), 0.95 -> r.getDouble(2),
          0.99 -> r.getDouble(3))) {
        // value must be an actual element whose rank is within eps*n of p*n
        val lo = vals.count(_ < v)
        val hi = vals.count(_ <= v)
        val target = p * n
        val eps = n / acc + 1
        assert(lo - eps <= target && target <= hi + eps,
          s"$pri p$p: value $v rank window [$lo,$hi] vs target $target ± $eps")
      }
    }
  }
}
