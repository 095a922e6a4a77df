package graft

import graft.functions.Udfs
import graft.plans.GraftRules
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The extension surface: optimizer rule, UDF, UDAF — plus ScalaCheck
  * property tests for the algebraic invariants (SURVEY.md §5). */
class ExtensionSpec extends SparkTestBase {

  /** Run a ScalaCheck property with a small case budget (each case
    * spins Spark jobs). */
  private def checkProp(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("RewriteDotProduct: HOF dot pattern becomes the native expression") {
    GraftRules.install(spark)
    val plan = Tables.embeddings(spark, sf)
      .select(graft.functions.SimilarityOps
        .dotHof(col("embedding"), col("embedding")).as("d"))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("dotproduct"), plan)
    // and the rewrite preserves values exactly
    val diff = Tables.embeddings(spark, sf).limit(100)
      .select(graft.functions.SimilarityOps
          .dotHof(col("embedding"), col("embedding")).as("d"),
        graft.plans.VectorExpressions
          .dotNative(col("embedding"), col("embedding")).as("n"))
      .filter(col("d") =!= col("n"))
    assert(diff.count() === 0)
  }

  test("native as-of join: AsOfJoinExec in plan, rows equal composed q19") {
    import graft.operators.TemporalOps
    val native = TemporalOps.q19b.build(spark, sf)
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    val composed = TemporalOps.q19.build(spark, sf)
    assert(native.exceptAll(composed).count() === 0)
    assert(composed.exceptAll(native).count() === 0)
  }

  test("native as-of join: null keys/times drop, empty right side ok") {
    import graft.plans.AsOfOps
    import spark.implicits._
    val l = Seq((1L, 10L, Some(1L)), (2L, 20L, None), (3L, 5L, Some(2L)))
      .toDF("id", "t", "k")
    val r = Seq((1L, 8L, "a"), (1L, 9L, "b"), (2L, 99L, "z"))
      .toDF("rk", "rt", "v")
    val out = AsOfOps.asofJoin(l, r, l("k"), r("rk"), l("t"), r("rt"))
      .select("id", "v").collect().map(x => (x.getLong(0), x.getString(1)))
    // id=1: k=1,t=10 -> latest rt<=10 is 9 -> "b"; id=2: null key drops;
    // id=3: k=2,t=5 -> no rt<=5 -> drops
    assert(out.toSeq === Seq((1L, "b")))
    val empty = AsOfOps.asofJoin(
      l, r.filter(col("rk") < 0), l("k"), r("rk"), l("t"), r("rt"))
    assert(empty.count() === 0)
    // outer mode: every left row survives; unmatched get null right
    val outer = AsOfOps.asofJoin(l, r, l("k"), r("rk"), l("t"), r("rt"),
        outer = true)
      .select("id", "v").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) null else x.getString(1)))
      .sortBy(_._1)
    assert(outer.toSeq === Seq((1L, "b"), (2L, null), (3L, null)))
  }

  test("native top-k: Partial+Final in plan, no WindowExec, map-side pruning fires") {
    import graft.operators.TemporalOps
    val native = TemporalOps.q94.build(spark, sf)
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("PartialTopK") && plan.contains("FinalTopK"), plan)
    assert(!plan.contains("Window"), plan)
    val rows = native.collect()
    assert(rows.nonEmpty)
    // parity with the window formulation
    import org.apache.spark.sql.expressions.Window
    val composed = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), col("value"))
      .withColumn("rank", row_number().over(Window.partitionBy("event_type")
        .orderBy(col("value").desc, col("event_id").asc)).cast("long"))
      .filter(col("rank") <= 20)
    val nativeUnordered = TemporalOps.q94.build(spark, sf)
    assert(nativeUnordered.exceptAll(composed).count() === 0)
    assert(composed.exceptAll(nativeUnordered).count() === 0)
  }

  test("native top-k: null keys/sort values, tiny groups, empty input") {
    import graft.plans.TopKOps
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), Some(3.0)), (2L, Some("a"), Some(1.0)),
      (3L, Some("a"), Some(2.0)), (4L, Some("b"), Some(9.0)),
      (5L, None, Some(5.0)), (6L, None, Some(7.0)),
      (7L, Some("a"), None))
      .toDF("id", "k", "v")
    val got = TopKOps.topKPerKey(df, Seq(df("k")),
        Seq(df("v").desc, df("id").asc), 2)
      .select("id", "k", "rank").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1),
        r.getLong(2))).toSet
    // "a": v desc nulls-last default? row_number over desc puts null v LAST
    // in Spark (desc_nulls_last is the .desc default) -> top-2: id1(3.0),id3(2.0)
    // null key forms its own group (like window partitioning): id6(7.0),id5(5.0)
    assert(got === Set((1L, "a", 1L), (3L, "a", 2L), (4L, "b", 1L),
      (6L, null, 1L), (5L, null, 2L)))
    // parity with the window path on the same frame, nulls included
    import org.apache.spark.sql.expressions.Window
    val composed = df.withColumn("rank",
        row_number().over(Window.partitionBy("k")
          .orderBy(col("v").desc, col("id").asc)).cast("long"))
      .filter(col("rank") <= 2).select("id", "k", "rank")
    val native = TopKOps.topKPerKey(df, Seq(df("k")),
      Seq(df("v").desc, df("id").asc), 2).select("id", "k", "rank")
    assert(native.exceptAll(composed).count() === 0)
    assert(composed.exceptAll(native).count() === 0)
    // empty input
    assert(TopKOps.topKPerKey(df.filter(col("id") < 0), Seq(df("k")),
      Seq(df("v").desc), 3).count() === 0)
  }

  test("property: native top-k equals window row_number on random tables") {
    import graft.plans.TopKOps
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val gen = for {
      n <- Gen.choose(0, 200)
      ks <- Gen.choose(1, 8)
      rows <- Gen.listOfN(n, for {
        k <- Gen.choose(0, ks)
        v <- Gen.choose(-50, 50)
      } yield (k, v))
    } yield rows.zipWithIndex.map { case ((k, v), i) => (i.toLong, k, v) }
    checkProp(Prop.forAll(gen) { rows =>
      val df = rows.toDF("id", "k", "v")
      val native = TopKOps.topKPerKey(df, Seq(df("k")),
        Seq(df("v").asc, df("id").asc), 3).select("id", "rank")
      val composed = df.withColumn("rank",
          row_number().over(Window.partitionBy("k")
            .orderBy(col("v").asc, col("id").asc)).cast("long"))
        .filter(col("rank") <= 3).select("id", "rank")
      native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty
    })
  }

  test("GraftSession.build installs the SQL surface on the live session") {
    val s = GraftSession.build() // same JVM -> returns the shared session,
                                 // imperative install path must still apply
    val v = s.sql("SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .head().getDouble(0)
    assert(v === 11.0)
  }

  test("SQL function registry: every graft_ function matches its DataFrame twin") {
    GraftRules.install(spark)
    Tables.embeddings(spark, sf).limit(200).createOrReplaceTempView("emb_sql")
    Tables.documents(spark, sf).limit(200).createOrReplaceTempView("docs_sql")

    // cosine/norm vs the Column-API formulation
    val simSql = spark.sql(
      """SELECT vec_id, graft_norm(embedding) AS n,
        |       graft_cosine(embedding, embedding) AS c
        |FROM emb_sql""".stripMargin).collect()
    simSql.foreach { r =>
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-12,
        s"self-cosine must be 1, got ${r.getDouble(2)}")
      assert(r.getDouble(1) > 0)
    }

    // md5_residue vs Canon.md5Residue
    val resid = spark.sql(
      "SELECT doc_id, graft_md5_residue(concat('strat:', doc_id), 10000) AS h FROM docs_sql")
    val twin = Tables.documents(spark, sf).limit(200)
      .select(col("doc_id"),
        Canon.md5Residue(concat(lit("strat:"), col("doc_id")), 10000L).as("h"))
    assert(resid.exceptAll(twin).isEmpty && twin.exceptAll(resid).isEmpty)

    // canon_url vs Canon.canonUrl
    val urls = spark.sql(
      "SELECT graft_canon_url('HTTPS://WWW.Src1.Example.COM/en/item3/?utm=x#frag') AS u")
      .head().getString(0)
    assert(urls == "src1.example.com/en/item3")

    // tokens vs the shared \S+ tokenizer
    val toks = spark.sql("SELECT graft_tokens('  a  b\tc ') AS t")
      .head().getSeq[String](0)
    assert(toks == Seq("a", "b", "c"))

    // zero-vector cosine is NULL, not NaN/divide-by-zero
    val z = spark.sql(
      "SELECT graft_cosine(array(CAST(0.0 AS FLOAT)), array(CAST(1.0 AS FLOAT))) AS c")
      .head()
    assert(z.isNullAt(0))
  }

  test("graft_clean_price UDF matches the declarative regexp path") {
    Udfs.register(spark)
    val df = Tables.part(spark, sf)
      .select(
        expr("graft_clean_price(concat('$', cast(p_retailprice as string)))").as("u"),
        regexp_replace(col("p_retailprice").cast("string"), "[$,]", "")
          .cast("decimal(18,4)").as("d"))
      .filter(col("u") =!= col("d"))
    assert(df.count() === 0)
    assert(Udfs.cleanPrice("$1,234.5").get ===
      new java.math.BigDecimal("1234.5000"))
    assert(Udfs.cleanPrice(null).isEmpty)
    assert(Udfs.cleanPrice("not a price").isEmpty)
  }

  test("DecimalSum UDAF equals Canon.dsum") {
    val a = Tables.lineitem(spark, sf)
      .agg(Udfs.decimalSum(col("l_quantity")).cast("double")).head().getDouble(0)
    val b = Tables.lineitem(spark, sf)
      .agg(Canon.dsum(col("l_quantity"))).head().getDouble(0)
    assert(a === b)
  }

  test("property: LWW dedup is idempotent") {
    import spark.implicits._
    val rowsGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(0, 8), Gen.chooseNum(0, 100)))
    checkProp(Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "v")
      val once = graft.sources.Warehouse.dedupByKey(df, "k", "v")
      val twice = graft.sources.Warehouse.dedupByKey(once, "k", "v")
      once.except(twice).count() == 0 &&
        twice.except(once).count() == 0 &&
        once.count() == rows.map(_._1).distinct.size
    })
  }

  test("graft_ngrams generator: streams n-grams, equals the composed form") {
    GraftRules.install(spark)
    Tables.documents(spark, sf).limit(50).createOrReplaceTempView("ngram_docs")
    val native = spark.sql(
      """SELECT doc_id, pos, ngram
        |FROM ngram_docs
        |LATERAL VIEW graft_ngrams(graft_tokens(text), 3) g AS pos, ngram
        |ORDER BY doc_id, pos""".stripMargin)
    // the composed formulation: materialize every n-gram array, explode
    val composed = spark.sql(
      """SELECT doc_id, CAST(p + 1 AS INT) AS pos, ngram
        |FROM (SELECT doc_id, graft_tokens(text) AS toks FROM ngram_docs)
        |LATERAL VIEW posexplode(
        |  transform(sequence(1, greatest(size(toks) - 2, 0)),
        |            i -> array_join(slice(toks, i, 3), ' '))) g AS p, ngram
        |ORDER BY doc_id, pos""".stripMargin)
    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty)
    assert(native.count() > 0)
    // generator plans as a Generate node (table-valued, not a projection)
    assert(native.queryExecution.executedPlan.toString.contains("Generate"))
    // edges: doc shorter than n -> zero rows; n = 1 -> the tokens themselves
    import spark.implicits._
    Seq((1L, "a b")).toDF("doc_id", "text").createOrReplaceTempView("ngram_short")
    assert(spark.sql(
      "SELECT * FROM ngram_short LATERAL VIEW graft_ngrams(graft_tokens(text), 3) g AS pos, ngram")
      .count() === 0)
    val unigrams = spark.sql(
      "SELECT ngram FROM ngram_short LATERAL VIEW graft_ngrams(graft_tokens(text), 1) g AS pos, ngram")
      .collect().map(_.getString(0)).toSeq
    assert(unigrams === Seq("a", "b"))
  }

  test("property: inner join row count = sum over keys of |L_k| * |R_k|") {
    import spark.implicits._
    val keys = Gen.listOf(Gen.chooseNum(0, 4))
    checkProp(Prop.forAll(keys, keys) { (lk, rk) =>
      val joined = lk.toDF("k").join(rk.toDF("j"), col("k") === col("j"), "inner").count()
      val expected = (0 until 5).map(k =>
        lk.count(_ == k).toLong * rk.count(_ == k)).sum
      joined == expected
    })
  }

  test("AQE splits a skewed shuffle-join partition (plan-level evidence)") {
    val spk = spark
    import spk.implicits._
    // one hot key carrying ~90% of the probe side
    val probe = ((1 to 60000).map(i => (0L, i.toLong)) ++
      (1 to 6000).map(i => ((i % 37 + 1).toLong, i.toLong))).toDF("k", "v")
    val build = (0 to 37).map(k => (k.toLong, s"dim$k")).toDF("k", "name")
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> util.Try(spk.conf.get(k)).toOption.filter(_ != null)).toMap
    try {
      spk.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spk.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spk.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      spk.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
      spk.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
      spk.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val joined = probe.join(build, "k")
      // collect() executes THIS DataFrame's own QueryExecution (count()
      // would wrap it in a new one), so AQE finalizes the plan we then
      // inspect; the skew-split shuffle read marks itself in it
      assert(joined.collect().length === 66000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("skew"),
        s"expected an AQE skew-split shuffle read in:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spk.conf.set(k, v)
      case (k, None) => spk.conf.unset(k)
    }
  }
}
