package graft

import graft.operators.DedupOps
import graft.sources.Sources
import graft.streaming.{ClusterView, NearDupStore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The incremental duplicate-cluster view ([[ClusterView]]): connected
  * components over the ≥0.5 near-dup graph, maintained off the
  * near-dup store's own change feed. Pinned here: component MERGE via
  * a re-text update, component SPLIT via erasing a path's middle doc
  * (the non-invertible edge deletion), incremental ≡ batch at every
  * drain, the ledger-only advance for edge-free store churn, and the
  * single-atomic-merge crash contract.
  */
class ClusterViewSpec extends SparkTestBase {
  import spark.implicits._

  private def freshRoot(tag: String) = {
    val r = java.nio.file.Files.createTempDirectory(tag)
    r.toFile.deleteOnExit()
    r
  }

  private def docsDf(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text").withColumn("lang", lit("en"))
      .select("doc_id", "lang", "text")

  /** Batch truth: thresholded q28 pairs → pointer-jumping CC → sizes. */
  private def expected(corpus: DataFrame): Seq[(Long, Long, Long)] = {
    val pairs = DedupOps.minhashPairsOf(DedupOps.sigsOf(corpus))
      .filter(col("est_jaccard") >= ClusterView.EdgeThreshold)
    if (pairs.isEmpty) return Seq.empty
    val labels = DedupOps.connectedComponents(pairs)
      .select(col("n").as("doc_id"), col("l").as("cluster_id"))
    labels.join(
      labels.groupBy("cluster_id").agg(count(lit(1)).as("csize")),
        Seq("cluster_id"))
      .select("doc_id", "cluster_id", "csize")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  private def viewed(view: String): Seq[(Long, Long, Long)] =
    ClusterView.clusters(spark, view).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  private def drainBoth(src: String, store: String, view: String,
      ckNd: String, ckCv: String): Unit = {
    NearDupStore.maintainQuery(spark, src, store, ckNd).awaitTermination()
    ClusterView.maintainQuery(spark, store, view, ckCv).awaitTermination()
  }

  private val t1 = "aa bb cc dd ee ff gg hh ii jj"

  test("merge then split: a re-text update joins two components, erasing " +
    "a path's middle doc splits one — incremental == batch throughout") {
    val root = freshRoot("clusterv")
    val src = root.resolve("docs").toString
    val store = root.resolve("store").toString
    val view = root.resolve("view").toString
    val ckNd = root.resolve("ck-nd").toString
    val ckCv = root.resolve("ck-cv").toString

    // two separate exact-dup components {1,2} and {10,11} + a loner
    val s1 = Seq(1L -> t1, 2L -> t1, 10L -> "zz yy xx ww vv uu tt ss",
      11L -> "zz yy xx ww vv uu tt ss", 20L -> "mm nn oo pp qq rr")
    Sources.commitVersion(docsDf(s1), src)
    drainBoth(src, store, view, ckNd, ckCv)
    val e1 = expected(docsDf(s1))
    assert(viewed(view) == e1)
    assert(e1.map(_._2).distinct.size == 2, s"two components expected: $e1")

    // MERGE: re-text doc 10 into group 1's text — {1,2,10} one component
    Sources.updateWhere(spark, src, col("doc_id") === 10L,
      Map("text" -> lit(t1)))
    val s2 = s1.map { case (id, t) => if (id == 10L) id -> t1 else id -> t }
    drainBoth(src, store, view, ckNd, ckCv)
    val e2 = expected(docsDf(s2))
    assert(viewed(view) == e2)
    assert(e2.filter(x => Set(1L, 2L, 10L)(x._1)).map(_._2).distinct.size == 1,
      s"1,2,10 must share a component: $e2")
    assert(!e2.exists(_._1 == 11L),
      s"doc 11 lost its only edge and must leave the view: $e2")

    // build the PATH 31-32-33 on a disjoint token alphabet (verified
    // against the deterministic md5 hashes: est(31,32)=0.75,
    // est(32,33)=0.5625, est(31,33)=0.4375 — below the edge bar even
    // though a band collides), then SPLIT it
    val p1 = "w07 w17 w27 w37 w47 w57 w67 w77 w87 w97"
    val p2 = "w07 w17 w27 w37 w47 w57 w67 w77 x87 x97"
    val p3 = "y07 y17 w27 w37 w47 w57 w67 w77 x87 x97"
    val path = Seq(31L -> p1, 32L -> p2, 33L -> p3)
    Sources.commitVersion(docsDf(path), src)
    val s3 = s2 ++ path
    drainBoth(src, store, view, ckNd, ckCv)
    val e3 = expected(docsDf(s3))
    assert(viewed(view) == e3)
    val pathComp = e3.filter(x => Set(31L, 32L, 33L)(x._1))
    assert(pathComp.size == 3 && pathComp.map(_._2).distinct.size == 1,
      s"path 31-32-33 must be one component: $e3")

    // the SPLIT: erase the middle; 31 and 33 share too little to pair
    Sources.deleteWhereDv(spark, src, col("doc_id") === 32L)
    val s4 = s3.filter(_._1 != 32L)
    drainBoth(src, store, view, ckNd, ckCv)
    val e4 = expected(docsDf(s4))
    assert(viewed(view) == e4)
    assert(!e4.exists(x => x._1 == 31L || x._1 == 33L),
      s"severed path ends kept an edge — fixture must split: $e4")
  }

  test("edge-free store churn (signature-only change) advances the " +
    "ledger without touching assignments; fresh-checkpoint replay is a " +
    "provable no-op") {
    val root = freshRoot("clusterv-ledger")
    val src = root.resolve("docs").toString
    val store = root.resolve("store").toString
    val view = root.resolve("view").toString
    val s1 = Seq(1L -> t1, 2L -> t1, 20L -> "mm nn oo pp qq rr ss tt")
    Sources.commitVersion(docsDf(s1), src)
    drainBoth(src, store, view, root.resolve("a").toString,
      root.resolve("b").toString)
    val before = viewed(view)
    // re-text the LONER: its signature and bands churn in the store,
    // no pair row changes
    Sources.updateWhere(spark, src, col("doc_id") === 20L,
      Map("text" -> lit("mm nn oo pp qq rr ss uu")))
    drainBoth(src, store, view, root.resolve("c").toString,
      root.resolve("d").toString)
    assert(viewed(view) == before)
    val vAfter = Sources.latestVersion(view)
    // replay the WHOLE store history on a fresh checkpoint: the ledger
    // must drop it before any work
    ClusterView.maintainQuery(spark, store, view,
      root.resolve("e").toString).awaitTermination()
    assert(Sources.latestVersion(view) == vAfter)
    assert(viewed(view) == before)
  }

  test("no partial application: a crash before the single merge leaves " +
    "the view bitwise untouched and the range replays verbatim") {
    val root = freshRoot("clusterv-crash")
    val src = root.resolve("docs").toString
    val store = root.resolve("store").toString
    val view = root.resolve("view").toString
    val ckNd = root.resolve("ck-nd").toString
    val ckCv = root.resolve("ck-cv").toString
    Sources.commitVersion(docsDf(Seq(1L -> t1, 2L -> t1)), src)
    drainBoth(src, store, view, ckNd, ckCv)
    val vBefore = Sources.latestVersion(view)
    val before = viewed(view)

    Sources.commitVersion(docsDf(Seq(3L -> t1)), src)
    NearDupStore.maintainQuery(spark, src, store, ckNd).awaitTermination()
    ClusterView.preMergeCrashHook =
      () => throw new RuntimeException("injected: die before the merge")
    try {
      val q = ClusterView.maintainQuery(spark, store, view, ckCv)
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.awaitTermination()
      }
    } finally ClusterView.preMergeCrashHook = () => ()
    assert(Sources.latestVersion(view) == vBefore)
    assert(viewed(view) == before)

    ClusterView.maintainQuery(spark, store, view, ckCv).awaitTermination()
    assert(viewed(view) ==
      expected(docsDf(Seq(1L -> t1, 2L -> t1, 3L -> t1))))
  }
}
