package graft

import graft.sources.Sources
import graft.streaming.DedupStore
import org.apache.spark.sql.functions._

/** The streaming exact-dedup store ([[DedupStore.maintainQuery]]):
  * survivor = MIN live doc_id per digest, maintained off the change
  * feed. The argmin is non-invertible, so the store re-aggregates the
  * TOUCHED digest groups from its own membership — these specs pin the
  * promotion path (survivor erased → next-lowest member takes over),
  * text edits moving a doc between groups, incremental ≡ batch at
  * every step, and the high-water ledger's replay guarantee.
  */
class DedupStoreSpec extends SparkTestBase {
  import spark.implicits._

  private def freshRoot(tag: String) = {
    val r = java.nio.file.Files.createTempDirectory(tag)
    r.toFile.deleteOnExit()
    r
  }

  private def survivorPairs(store: String): Seq[(String, Long)] =
    DedupStore.survivors(spark, store).orderBy("digest").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq

  private def expectedOf(df: org.apache.spark.sql.DataFrame,
      digest: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : Seq[(String, Long)] =
    df.groupBy(digest(col("text")).as("digest"))
      .agg(min(col("doc_id")).as("survivor_id"))
      .orderBy("digest").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq

  test("promotion: erasing a group's survivor promotes the next-lowest " +
    "member; erasing the last member retires the digest; a re-insert " +
    "re-seats the lower id") {
    val root = freshRoot("dedup-promo")
    val src = root.resolve("docs").toString
    val store = root.resolve("store").toString
    val ck = root.resolve("ck").toString
    // two duplicate groups + one singleton
    Sources.commitVersion(Seq(
      (1L, "alpha alpha"), (5L, "alpha alpha"), (9L, "alpha alpha"),
      (2L, "beta beta"), (7L, "beta beta"),
      (3L, "gamma")).toDF("doc_id", "text"), src)
    DedupStore.maintainQuery(spark, src, store, ck).awaitTermination()
    def survivorIds(): Map[String, Long] =
      survivorPairs(store).toMap.map { case (d, id) => d -> id }
    val dAlpha = Seq(("alpha alpha", 0L)).toDF("text", "x")
      .select(md5(col("text"))).head.getString(0)
    val dBeta = Seq(("beta beta", 0L)).toDF("text", "x")
      .select(md5(col("text"))).head.getString(0)
    assert(survivorIds()(dAlpha) === 1L && survivorIds()(dBeta) === 2L)
    // erase alpha's survivor -> 5 promotes; beta untouched
    Sources.deleteWhereDv(spark, src, col("doc_id") === 1L)
    DedupStore.maintainQuery(spark, src, store, ck).awaitTermination()
    assert(survivorIds()(dAlpha) === 5L && survivorIds()(dBeta) === 2L)
    // erase 5 too -> 9 promotes
    Sources.deleteWhereDv(spark, src, col("doc_id") === 5L)
    DedupStore.maintainQuery(spark, src, store, ck).awaitTermination()
    assert(survivorIds()(dAlpha) === 9L)
    // erase the last alpha member -> the digest retires entirely
    Sources.deleteWhereDv(spark, src, col("doc_id") === 9L)
    DedupStore.maintainQuery(spark, src, store, ck).awaitTermination()
    assert(!survivorIds().contains(dAlpha))
    assert(DedupStore.members(spark, store)
      .filter(col("digest") === dAlpha).isEmpty)
    // re-insert a LOWER id than beta's survivor -> it takes over
    Sources.commitVersion(Seq((0L, "beta beta")).toDF("doc_id", "text"), src)
    DedupStore.maintainQuery(spark, src, store, ck).awaitTermination()
    assert(survivorIds()(dBeta) === 0L)
  }

  test("a text edit moves the doc between digest groups: the old group " +
    "sheds the member (promoting if needed), the new group gains it") {
    val root = freshRoot("dedup-edit")
    val src = root.resolve("docs").toString
    val store = root.resolve("store").toString
    val ck = root.resolve("ck").toString
    Sources.commitVersion(Seq(
      (1L, "left text"), (4L, "left text"),
      (6L, "right text")).toDF("doc_id", "text"), src)
    DedupStore.maintainQuery(spark, src, store, ck).awaitTermination()
    // edit the LEFT survivor into the right group
    Sources.updateWhere(spark, src, col("doc_id") === 1L,
      Map("text" -> lit("right text")))
    DedupStore.maintainQuery(spark, src, store, ck).awaitTermination()
    val live = Sources.readVersion(spark, src)
    val want = expectedOf(live, DedupStore.fullDigest)
    assert(survivorPairs(store) === want,
      "after the edit: left promotes to 4, right's survivor drops to 1")
    val dLeft = Seq(1).toDF("x")
      .select(md5(lit("left text"))).head.getString(0)
    val dRight = Seq(1).toDF("x")
      .select(md5(lit("right text"))).head.getString(0)
    val m = survivorPairs(store).toMap
    assert(m(dLeft) === 4L && m(dRight) === 1L)
  }

  test("incremental equals the batch recompute at every lifecycle step; " +
    "fresh-checkpoint and same-checkpoint replays are no-ops") {
    val root = freshRoot("dedup-eq")
    val src = root.resolve("docs").toString
    val store = root.resolve("store").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    Sources.commitVersion(docs.filter(pmod(col("doc_id"), lit(3)) === 0), src)
    DedupStore.maintainQuery(spark, src, store,
      root.resolve("ck1").toString, DedupStore.headDigest).awaitTermination()
    def liveNow() = Sources.readVersion(spark, src)
    assert(survivorPairs(store) === expectedOf(liveNow(), DedupStore.headDigest))
    Sources.commitVersion(docs.filter(pmod(col("doc_id"), lit(3)) === 1), src)
    Sources.deleteWhereDv(spark, src, pmod(col("doc_id"), lit(11)) === 0)
    DedupStore.maintainQuery(spark, src, store,
      root.resolve("ck1").toString, DedupStore.headDigest).awaitTermination()
    val step2 = survivorPairs(store)
    assert(step2 === expectedOf(liveNow(), DedupStore.headDigest))
    val vApplied = Sources.latestVersion(store)
    // FRESH checkpoint: the whole feed replays — the ledger must drop
    // every already-applied version before any work runs
    DedupStore.maintainQuery(spark, src, store,
      root.resolve("ck2").toString, DedupStore.headDigest).awaitTermination()
    assert(Sources.latestVersion(store) === vApplied,
      "a full fresh-checkpoint replay must commit nothing")
    assert(survivorPairs(store) === step2)
    // same-checkpoint re-drain: also a no-op
    DedupStore.maintainQuery(spark, src, store,
      root.resolve("ck2").toString, DedupStore.headDigest).awaitTermination()
    assert(Sources.latestVersion(store) === vApplied)
    // membership backs the survivors exactly
    val m = DedupStore.members(spark, store)
      .groupBy("digest").agg(min(col("doc_id")).as("lo"))
    val s = DedupStore.survivors(spark, store)
    assert(s.join(m, Seq("digest"))
      .filter(col("survivor_id") =!= col("lo")).isEmpty,
      "every survivor must be its group's minimum live member")
  }
}
