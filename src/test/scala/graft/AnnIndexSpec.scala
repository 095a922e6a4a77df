package graft

import graft.functions.AnnIndex
import graft.sources.Sources
import org.apache.spark.sql.functions._

/** The persisted IVFADC index ([[AnnIndex]]): CDF-maintained index
  * table ≡ full rebuild, updates/deletes track, replay idempotent. */
class AnnIndexSpec extends SparkTestBase {

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit(); d.toString
  }

  private def indexContent(idx: String): Set[(Long, Long, Seq[Int])] =
    Sources.readVersion(spark, idx)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2)))
      .toSet

  test("a 3-commit incrementally maintained index equals the full " +
    "rebuild; re-embeds re-encode, deletes leave; replay is idempotent") {
    val root = tmp("ann-idx")
    val src = s"$root/emb"
    val idx = s"$root/idx"
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding", "label")
    val n = emb.count()
    val (c1, c2) = (n / 3, 2 * n / 3)
    Sources.commitVersion(emb.filter(col("vec_id") < c1), src)
    // model trained ONCE at init, from the source head — later commits
    // must encode under exactly this pinned model
    AnnIndex.init(spark, src, idx)
    def drain(ckpt: String = s"$root/ckpt"): Unit = {
      val q = AnnIndex.maintainQuery(spark, src, idx, ckpt)
      q.awaitTermination()
    }
    drain()
    Sources.commitVersion(
      emb.filter(col("vec_id") >= c1 && col("vec_id") < c2), src)
    drain()
    Sources.commitVersion(emb.filter(col("vec_id") >= c2), src)
    drain()
    val model = AnnIndex.loadModel(idx)
    val fullRebuild = AnnIndex.encode(emb, model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2))).toSet
    assert(indexContent(idx) === fullRebuild,
      "3-commit incremental maintenance must equal the one-shot rebuild")
    assert(indexContent(idx).size === n)

    // source UPDATE (re-embed vec 5: reversed vector) + DELETE (vec 6):
    // the index must re-encode one and drop the other, off the feed
    val upd = emb.filter(col("vec_id") === 5)
      .select(col("vec_id"), reverse(col("embedding")).as("embedding"),
        col("label"), lit("upsert").as("op"))
    val del = emb.filter(col("vec_id") === 6)
      .select(col("vec_id"), col("embedding"), col("label"),
        lit("delete").as("op"))
    Sources.mergeVersion(spark, src, upd.unionByName(del), "vec_id")
    drain()
    val after = indexContent(idx)
    assert(after.size === n - 1)
    assert(!after.exists(_._1 === 6L), "deleted vector must leave the index")
    val expected5 = AnnIndex.encode(
      emb.filter(col("vec_id") === 5)
        .select(col("vec_id"), reverse(col("embedding")).as("embedding")),
      model).collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2)))
      .head
    assert(after.filter(_._1 === 5L) === Set(expected5),
      "re-embedded vector must carry codes of the NEW embedding")

    // ops accident: the checkpoint is lost and maintenance restarts
    // from scratch — the full feed re-applies through the keyed merge
    // and the query-id ledger; index content must be unchanged
    drain(s"$root/ckpt-fresh")
    assert(indexContent(idx) === after,
      "fresh-checkpoint replay must be content-idempotent")

    // and the search path actually uses the persisted rows: searching
    // with the index table returns 1 row per probe
    val res = AnnIndex.searchFromIndex(spark, emb, idx,
      col("vec_id") < 20)
    assert(res.count() === 20)
  }

  /** Walk the AQE-final physical plan, descending into stages. */
  private def planNodes(df: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def go(p: SparkPlan): Seq[SparkPlan] =
      p +: (p match {
        case a: AdaptiveSparkPlanExec => go(a.executedPlan)
        case s: QueryStageExec => go(s.plan)
        case o => o.children.flatMap(go)
      })
    go(df.queryExecution.executedPlan)
  }

  private def crossProducts(df: org.apache.spark.sql.DataFrame): Int =
    planNodes(df).count {
      case _: org.apache.spark.sql.execution.joins
          .BroadcastNestedLoopJoinExec => true
      case _: org.apache.spark.sql.execution.joins
          .CartesianProductExec => true
      case _ => false
    }

  test("q140b composed mutual-kNN: pair recall >= 0.9 vs the exact " +
    "q140, and NO BroadcastNestedLoopJoin/cartesian survives — while " +
    "the exact form provably plans one (the contrast the composition " +
    "removes)") {
    def pairs(name: String): (Set[(Long, Long)],
        org.apache.spark.sql.DataFrame) = {
      val df = SparkEntry.queries(name)(spark, sf)
      (df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet, df)
    }
    val (exact, exactDf) = pairs("q140_mutual_knn")
    val (approx, approxDf) = pairs("q140b_mutual_knn_scale")
    assert(exact.nonEmpty)
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.9,
      s"composed mutual-kNN pair recall $recall below the 0.9 gate " +
        s"(exact=${exact.size}, approx=${approx.size})")
    // the scale claim itself: the composed query's EXECUTED plan has no
    // cross-product node anywhere — candidates come from posting-list
    // equi-joins; the exact fixture-scale form does plan one, which is
    // precisely what q140b exists to remove
    assert(crossProducts(approxDf) === 0,
      "q140b must plan no BroadcastNestedLoopJoin/CartesianProduct")
    assert(crossProducts(exactDf) > 0,
      "q140's all-cross-pairs form is expected to plan a BNLJ at " +
        "fixture scale — if this starts failing, the contrast gate " +
        "needs a new witness")
  }

  test("q223 margin mining: precision+recall >= 0.85 vs the exact " +
    "ratio-margin form, every mined pair margin-mutual above 1.0, " +
    "and no cross product plans") {
    val df = SparkEntry.queries("q223_margin_mine")(spark, sf)
    val mined = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(mined.nonEmpty, "the miner must find pairs on the fixture")
    assert(mined.forall(_._3 > 1.0),
      "every mined pair must clear the margin threshold")
    assert(crossProducts(df) === 0,
      "q223 must plan no BroadcastNestedLoopJoin/CartesianProduct")
    // exact reference: brute-force ratio margins over ALL side-crossing
    // pairs (500 fixture vectors — driver-side is the honest oracle)
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(x: Array[Double], y: Array[Double]): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < x.length) {
        d += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1 }
      d / math.sqrt(nx * ny)
    }
    val aIds = vecs.keys.filter(_ % 2 == 0).toSeq.sorted
    val bIds = vecs.keys.filter(_ % 2 == 1).toSeq.sorted
    val sims = (for (a <- aIds; b <- bIds)
      yield ((a, b), cos(vecs(a), vecs(b)))).toMap
    def avgTopK(center: Long, others: Seq[Long],
        simOf: Long => Double): Double = {
      val top = others.map(o => (simOf(o), o))
        .sortBy { case (s2, o) => (-s2, o) }.take(4).map(_._1)
      top.sum / top.length
    }
    val avgA = aIds.map(a => a -> avgTopK(a, bIds, b => sims((a, b)))).toMap
    val avgB = bIds.map(b => b -> avgTopK(b, aIds, a => sims((a, b)))).toMap
    def margin(a: Long, b: Long): Double =
      sims((a, b)) / ((avgA(a) + avgB(b)) / 2)
    val fwd = aIds.map(a =>
      a -> bIds.map(b => (margin(a, b), b)).max(Ordering.Tuple2(
        Ordering.Double.TotalOrdering, Ordering.Long.reverse))._2).toMap
    val bwd = bIds.map(b =>
      b -> aIds.map(a => (margin(a, b), a)).max(Ordering.Tuple2(
        Ordering.Double.TotalOrdering, Ordering.Long.reverse))._2).toMap
    val exact = aIds.flatMap { a =>
      val b = fwd(a)
      if (bwd(b) == a && margin(a, b) > 1.0) Some((a, b)) else None
    }.toSet
    assert(exact.nonEmpty)
    val minedPairs = mined.map(p => (p._1, p._2)).toSet
    val recall = (exact intersect minedPairs).size.toDouble / exact.size
    val precision =
      (exact intersect minedPairs).size.toDouble / minedPairs.size
    assert(recall >= 0.85 && precision >= 0.85,
      s"margin mining recall=$recall precision=$precision below the " +
        s"0.85 gate (exact=${exact.size}, mined=${minedPairs.size})")
  }

  test("net maintenance off a lineage source: a source compaction " +
    "drain re-encodes nothing; re-embeds/deletes track; replay no-op") {
    val root = tmp("ann-idx-net")
    val src = s"$root/emb"
    val idx = s"$root/idx"
    val emb = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding", "label")
    Sources.commitVersion(emb.filter(col("vec_id") < 100), src)
    graft.sources.RowIds.enableRowIds(src)
    Sources.commitVersion(
      emb.filter(col("vec_id") >= 100 && col("vec_id") < 200), src)
    AnnIndex.init(spark, src, idx)
    val model = AnnIndex.loadModel(idx)
    def drain(ckpt: String = s"$root/ckpt"): Unit =
      AnnIndex.maintainNetQuery(spark, src, idx, ckpt).awaitTermination()
    def content(): Set[(Long, Long, Seq[Int])] =
      Sources.readVersion(spark, idx).filter(col("b_id") >= 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getSeq[Int](2))).toSet
    def rebuild(df: org.apache.spark.sql.DataFrame) =
      AnnIndex.encode(df, model).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2))).toSet
    drain()
    assert(content() === rebuild(emb.filter(col("vec_id") < 200)))
    // pure layout work: only the ledger bookmark lands — no data row
    // of the index changes
    Sources.compactVersion(spark, src, 64L)
    val data0 = content()
    drain()
    assert(content() === data0,
      "a source compaction drain must not change one index row")
    // a re-embed (id-preserving update) and a delete still track
    Sources.updateWhere(spark, src, col("vec_id") === 7,
      Map("embedding" -> reverse(col("embedding"))))
    Sources.deleteWhereDv(spark, src, col("vec_id") === 9)
    drain()
    val expected = rebuild(
      emb.filter(col("vec_id") < 200 && col("vec_id") =!= 9)
        .withColumn("embedding", when(col("vec_id") === 7,
          reverse(col("embedding"))).otherwise(col("embedding"))))
    assert(content() === expected)
    // fresh checkpoint: the in-band ledger makes the replay a no-op
    drain(s"$root/ckpt2")
    assert(content() === expected)
  }

  test("a negative vec_id fails maintenance loudly — the in-band " +
    "ledger owns the negative b_id keyspace") {
    val root = tmp("ann-neg")
    val src = s"$root/emb"
    val idx = s"$root/idx"
    val emb = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding", "label")
    Sources.commitVersion(emb.filter(col("vec_id") < 100), src)
    AnnIndex.init(spark, src, idx)
    val model = AnnIndex.loadModel(idx)
    val e = intercept[Exception] {
      AnnIndex.encode(
        emb.filter(col("vec_id") < 3)
          .withColumn("vec_id", col("vec_id") - 10L), model)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("vec_id >= 0")),
      s"expected the keyspace guard, got $e")
    // non-negative ids encode unchanged
    assert(AnnIndex.encode(emb.filter(col("vec_id") < 3), model)
      .count() === 3L)
  }
}
