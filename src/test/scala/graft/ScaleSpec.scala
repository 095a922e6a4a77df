package graft

import graft.operators.{AnalyticOps, ScaleOps}
import graft.functions.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The at-scale restatements (ScaleOps) carry two obligations, both
  * pinned here: (1) output EQUALITY with their exact counterparts —
  * six of seven reuse the exact query's oracle, so any divergence is a
  * bug, not a tolerance; (2) a physical plan containing ZERO
  * unpartitioned Window operators — the property that makes them the
  * 100 TB form (the exact originals funnel fact/entity grain through
  * one global sort task). */
class ScaleSpec extends SparkTestBase {

  /** All physical nodes, descending through AQE wrapper/stage nodes
    * (inspect only AFTER an action so AQE has finalized the plan). */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] =
    p +: (p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case q: QueryStageExec        => allNodes(q.plan)
      case other                    => other.children.flatMap(allNodes)
    })

  private def assertNoGlobalWindow(df: DataFrame): Unit = {
    df.collect() // finalize AQE before reading the executed plan
    val global = allNodes(df.queryExecution.executedPlan).collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(global.isEmpty,
      s"unpartitioned Window in plan:\n${global.mkString("\n")}")
  }

  private def sameRows(a: DataFrame, b: DataFrame): Unit = {
    val ra = a.collect().toSeq
    val rb = b.collect().toSeq
    assert(ra.size === rb.size)
    ra.zip(rb).zipWithIndex.foreach { case ((x, y), i) =>
      assert(x === y, s"row $i differs: $x vs $y")
    }
  }

  test("exact rank device: equals the global-window row_number, any bucket count") {
    val o = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_totalprice"))
    val expected = o.withColumn("rn", row_number()
        .over(Window.orderBy(col("o_totalprice").asc, col("o_orderkey").asc))
        .cast("long"))
      .orderBy("o_orderkey").collect().toSeq
    for (b <- Seq(1, 3, 32)) {
      val got = ScaleOps.withExactRank(o, "rn",
          Seq("o_totalprice" -> true, "o_orderkey" -> true), buckets = b)
        .orderBy("o_orderkey").collect().toSeq
      assert(got === expected, s"buckets=$b diverged")
    }
  }

  test("exact rank device: descending order and date keys") {
    val base = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("r_date"))
    val expected = base.withColumn("rn", row_number()
        .over(Window.orderBy(col("r_date").desc, col("o_custkey").asc))
        .cast("long"))
      .orderBy("o_custkey").collect().toSeq
    val got = ScaleOps.withExactRank(base, "rn",
        Seq("r_date" -> false, "o_custkey" -> true))
      .orderBy("o_custkey").collect().toSeq
    assert(got === expected)
  }

  test("exact rank device: NULL sort keys match the window under asc AND desc") {
    import spark.implicits._
    // every 7th key NULL — at 5% sampling some boundary tuples will be
    // null too, exercising both the null-row and null-boundary branches
    val base = Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 7 === 0, lit(null))
          .otherwise(col("o_totalprice")).as("v"))
    for (asc <- Seq(true, false)) {
      val ord = if (asc) col("v").asc else col("v").desc
      val expected = base.withColumn("rn", row_number()
          .over(Window.orderBy(ord, col("o_orderkey").asc)).cast("long"))
        .orderBy("o_orderkey").collect().toSeq
      val got = ScaleOps.withExactRank(base, "rn",
          Seq("v" -> asc, "o_orderkey" -> true), sampleFraction = 0.5)
        .orderBy("o_orderkey").collect().toSeq
      assert(got === expected, s"asc=$asc diverged on NULL keys")
    }
  }

  test("ntile closed form matches the ntile window for all n in 1..25, k=4") {
    import spark.implicits._
    for (n <- 1 to 25) {
      val df = (1 to n).toDF("v")
        .withColumn("nt", ntile(4).over(Window.orderBy("v")).cast("long"))
        .withColumn("rn", row_number().over(Window.orderBy("v")).cast("long"))
        .withColumn("n", lit(n.toLong))
        .withColumn("cf", expr(
          """CASE WHEN rn <= (n % 4) * ((n DIV 4) + 1)
            |     THEN (rn + (n DIV 4)) DIV ((n DIV 4) + 1)
            |     ELSE (n % 4) + ((rn - (n % 4) * ((n DIV 4) + 1))
            |                      + (n DIV 4) - 1) DIV (n DIV 4)
            |END""".stripMargin))
      assert(df.filter(col("nt") =!= col("cf")).count() === 0, s"n=$n")
    }
  }

  test("q39b == q39 and its plan has no unpartitioned window") {
    sameRows(ScaleOps.q39b.build(spark, sf), AnalyticOps.q39.build(spark, sf))
    assertNoGlobalWindow(ScaleOps.q39b.build(spark, sf))
  }

  test("q108b == q108 (three exact ntiles) and no unpartitioned window") {
    sameRows(ScaleOps.q108b.build(spark, sf), AnalyticOps.q108.build(spark, sf))
    assertNoGlobalWindow(ScaleOps.q108b.build(spark, sf))
  }

  test("q115b == q115 and no unpartitioned window") {
    sameRows(ScaleOps.q115b.build(spark, sf), AnalyticOps.q115.build(spark, sf))
    assertNoGlobalWindow(ScaleOps.q115b.build(spark, sf))
  }

  test("q124b == q124 and no unpartitioned window") {
    sameRows(ScaleOps.q124b.build(spark, sf), AnalyticOps.q124.build(spark, sf))
    assertNoGlobalWindow(ScaleOps.q124b.build(spark, sf))
  }

  test("q161b == q161 and no unpartitioned window") {
    sameRows(ScaleOps.q161b.build(spark, sf), AnalyticOps.q161.build(spark, sf))
    assertNoGlobalWindow(ScaleOps.q161b.build(spark, sf))
  }

  test("q174b == q174 and no unpartitioned window") {
    sameRows(ScaleOps.q174b.build(spark, sf), TextOps.q174.build(spark, sf))
    assertNoGlobalWindow(ScaleOps.q174b.build(spark, sf))
  }

  test("q157b: per-partition lateness reconciles with the event count; " +
    "lateness never exceeds the global-HWM form; no unpartitioned window") {
    val df = ScaleOps.q157b.build(spark, sf).cache()
    val total = Tables.events(spark, sf).count()
    assert(df.agg(sum("n")).head().getLong(0) === total)
    // per-partition HWM <= global HWM pointwise => per-partition max
    // lateness <= the global form's overall max lateness
    val globalMax = graft.operators.TemporalOps.q157.build(spark, sf)
      .agg(max("max_late_s")).head().getLong(0)
    assert(df.agg(max("max_late_s")).head().getLong(0) <= globalMax)
    df.select("bucket_id").collect()
      .foreach(r => assert(r.getLong(0) >= 0 && r.getLong(0) <= 5))
    assertNoGlobalWindow(ScaleOps.q157b.build(spark, sf))
    df.unpersist()
  }
}
