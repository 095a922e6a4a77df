package graft

import graft.operators.DedupOps
import graft.sources.Sources
import graft.streaming.{ClusterView, NearDupStore, VerdictView}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The incremental dedup-verdict view ([[VerdictView]]): q68's
  * keep/drop rule maintained off the cluster view's feed — the last
  * link of the fully-incremental dedup chain. Pinned: keeper
  * PROMOTION when an erasure takes the current keeper out, re-verdict
  * of BOTH clusters on a doc's move, text-edit propagation through
  * the whole three-store chain, and the crash contract.
  */
class VerdictViewSpec extends SparkTestBase {
  import spark.implicits._

  private def freshRoot(tag: String) = {
    val r = java.nio.file.Files.createTempDirectory(tag)
    r.toFile.deleteOnExit()
    r
  }

  private def docsDf(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text").withColumn("lang", lit("en"))
      .select("doc_id", "lang", "text")

  /** Batch truth: thresholded q28 pairs → CC → q68's keeper window. */
  private def expected(corpus: DataFrame): Seq[(Long, Long, Long, Boolean)] = {
    val pairs = DedupOps.minhashPairsOf(DedupOps.sigsOf(corpus))
      .filter(col("est_jaccard") >= ClusterView.EdgeThreshold)
    if (pairs.isEmpty) return Seq.empty
    val labels = DedupOps.connectedComponents(pairs)
      .select(col("n").as("doc_id"), col("l").as("cluster_id"))
    val w = Window.partitionBy("cluster_id")
      .orderBy(col("n_tokens").desc, col("doc_id").asc)
    labels.join(VerdictView.tokenCount(corpus), Seq("doc_id"))
      .withColumn("keep", row_number().over(w) === 1)
      .select("doc_id", "cluster_id", "n_tokens", "keep")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq
  }

  private def viewed(vv: String): Seq[(Long, Long, Long, Boolean)] =
    VerdictView.verdicts(spark, vv).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq

  private case class Chain(src: String, store: String, view: String,
      vv: String, ckNd: String, ckCv: String, ckVv: String) {
    def drain(): Unit = {
      NearDupStore.maintainQuery(spark, src, store, ckNd).awaitTermination()
      ClusterView.maintainQuery(spark, store, view, ckCv).awaitTermination()
      VerdictView.maintainQuery(spark, src, view, vv, ckVv)
        .awaitTermination()
    }
  }

  private def chain(tag: String): Chain = {
    val r = freshRoot(tag)
    Chain(r.resolve("src").toString, r.resolve("store").toString,
      r.resolve("view").toString, r.resolve("vv").toString,
      r.resolve("ck-nd").toString, r.resolve("ck-cv").toString,
      r.resolve("ck-vv").toString)
  }

  // one near-dup family with DISTINCT lengths: the base sentence, a
  // near-copy with one extra token (the keeper), a near-copy with one
  // token swapped
  private val base10 = "aa bb cc dd ee ff gg hh ii jj"
  private val long11 = "aa bb cc dd ee ff gg hh ii jj kk"
  private val var10 = "aa bb cc dd ee ff gg hh ii zz"

  test("keeper promotion through the chain: erasing the longest doc " +
    "re-picks the keeper inside the touched cluster only") {
    val c = chain("vv-promo")
    val s1 = Seq(1L -> base10, 2L -> long11, 3L -> var10,
      10L -> "mm nn oo pp qq rr ss tt uu vv",
      11L -> "mm nn oo pp qq rr ss tt uu vv ww")
    Sources.commitVersion(docsDf(s1), c.src)
    c.drain()
    val e1 = expected(docsDf(s1))
    assert(viewed(c.vv) == e1)
    // the 11-token doc keeps its cluster
    assert(e1.exists(v => v._1 == 2L && v._4),
      s"longest doc must be the keeper: $e1")
    assert(e1.exists(v => v._1 == 1L && !v._4), s"base must lose: $e1")

    Sources.deleteWhereDv(spark, c.src, col("doc_id") === 2L)
    val s2 = s1.filter(_._1 != 2L)
    c.drain()
    val e2 = expected(docsDf(s2))
    assert(viewed(c.vv) == e2)
    // promotion: with 2 gone, the 10-token min-id doc takes keep
    val k = e2.filter(v => Set(1L, 3L)(v._1))
    assert(k.nonEmpty && k.exists(_._4),
      s"cluster must re-pick a keeper after the erasure: $e2")
    // the untouched second cluster kept its verdicts verbatim
    assert(e2.filter(v => Set(10L, 11L)(v._1)) ==
      e1.filter(v => Set(10L, 11L)(v._1)))
  }

  test("a doc's move re-verdicts BOTH clusters; text-edit length " +
    "changes propagate through the three-store chain") {
    val c = chain("vv-move")
    val s1 = Seq(1L -> base10, 2L -> long11,
      10L -> "mm nn oo pp qq rr ss tt uu vv",
      11L -> "mm nn oo pp qq rr ss tt uu vv ww")
    Sources.commitVersion(docsDf(s1), c.src)
    c.drain()
    assert(viewed(c.vv) == expected(docsDf(s1)))
    // move doc 11 into cluster 1's family with a LONGER text: it must
    // take cluster 1's keep AND cluster {10,11} dissolves (10 loses
    // its only edge and leaves the view)
    val moved = "aa bb cc dd ee ff gg hh ii jj kk ll"
    Sources.updateWhere(spark, c.src, col("doc_id") === 11L,
      Map("text" -> lit(moved)))
    val s2 = s1.map { case (id, t) => if (id == 11L) id -> moved else id -> t }
    c.drain()
    val e2 = expected(docsDf(s2))
    assert(viewed(c.vv) == e2)
    assert(e2.exists(v => v._1 == 11L && v._4),
      s"the moved longer doc must take the keep: $e2")
    assert(e2.exists(v => v._1 == 2L && !v._4),
      s"the old keeper must yield: $e2")
    assert(!e2.exists(_._1 == 10L),
      s"the dissolved cluster's survivor must leave the view: $e2")
  }

  test("no partial application: a crash before the merge leaves the " +
    "verdicts bitwise untouched; the range replays verbatim") {
    val c = chain("vv-crash")
    Sources.commitVersion(docsDf(Seq(1L -> base10, 2L -> long11)), c.src)
    c.drain()
    val before = viewed(c.vv)
    val vBefore = Sources.latestVersion(c.vv)
    Sources.commitVersion(docsDf(Seq(3L -> var10)), c.src)
    NearDupStore.maintainQuery(spark, c.src, c.store, c.ckNd)
      .awaitTermination()
    ClusterView.maintainQuery(spark, c.store, c.view, c.ckCv)
      .awaitTermination()
    VerdictView.preMergeCrashHook =
      () => throw new RuntimeException("injected: die before the merge")
    try {
      val q = VerdictView.maintainQuery(spark, c.src, c.view, c.vv, c.ckVv)
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.awaitTermination()
      }
    } finally VerdictView.preMergeCrashHook = () => ()
    assert(Sources.latestVersion(c.vv) == vBefore)
    assert(viewed(c.vv) == before)
    VerdictView.maintainQuery(spark, c.src, c.view, c.vv, c.ckVv)
      .awaitTermination()
    assert(viewed(c.vv) ==
      expected(docsDf(Seq(1L -> base10, 2L -> long11, 3L -> var10))))
  }
}
