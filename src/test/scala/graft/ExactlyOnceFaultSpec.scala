package graft

import graft.sources.Sources
import graft.streaming.StreamingPipeline
import org.apache.spark.sql.functions._

/** Fault-injection specs for the exactly-once machinery: the round-5
  * hardening (batch-keyed dedup store, atomic epoch markers,
  * publish-failure cleanup, query-id-keyed replication ledger) shipped
  * behind happy-path tests only — these exercise the CRASH and REPLAY
  * scenarios that code exists for. */
class ExactlyOnceFaultSpec extends SparkTestBase {

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit(); d.toString
  }

  private def keptIds(out: String): Set[Long] =
    spark.read.parquet(s"$out/kept").select("doc_id")
      .collect().map(_.getLong(0)).toSet

  test("a replayed foreachBatch (duplicate batchId) redoes the cdf dedup " +
    "byte-identically: kept set unchanged, store not double-counted") {
    val root = tmp("replay-dedup")
    val t = s"$root/docs"
    val store = s"$root/store"
    val out = s"$root/out"
    val docs = Tables.documents(spark, sf).select("doc_id", "text", "lang")
    val n = docs.count()
    val cut = n / 2
    def drain(): Unit = {
      val q = StreamingPipeline.cdfDedupQuery(spark, t, store, out)
      q.awaitTermination()
    }
    Sources.commitVersion(docs.filter(col("doc_id") < cut), t); drain()
    val v1 = Sources.latestVersion(t)
    Sources.commitVersion(docs.filter(col("doc_id") >= cut), t); drain()
    val v2 = Sources.latestVersion(t)
    val keptBefore = keptIds(out)
    def bidDirs(p: String): Set[String] =
      Option(new java.io.File(p).listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("bid="))
        .map(_.getName).toSet
    val storeBids = bidDirs(store)
    val keptBids = bidDirs(s"$out/kept")
    assert(storeBids.size >= 2, s"expected batch-keyed store dirs, got $storeBids")
    // REPLAY INJECTION: re-run the foreachBatch body with the LAST
    // batch's id and its exact input (the second commit's change feed) —
    // foreachBatch is at-least-once, so this is a legal delivery. The
    // batch-keyed store must exclude the batch's own first-attempt
    // signatures (else every doc matches itself and the kept set
    // collapses), and the per-batch OVERWRITE must leave the kept
    // output byte-identical instead of double-appending.
    // slots are bid=<run>_<id>; replay the highest batch id of the run
    val run = StreamingPipeline.checkpointQueryId(s"$out/_ckpt")
    val lastBid = keptBids
      .map(_.stripPrefix(s"bid=${run}_").toLong).max
    val replayInput = Sources.readChanges(spark, t, v1, v2)
      .drop("_change_type")
    StreamingPipeline.dedupBatchAgainstStore(replayInput, store,
      Some(lastBid), Some(run))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$out/kept/bid=${run}_$lastBid")
    assert(keptIds(out) === keptBefore,
      "a duplicate-batchId replay must not change the kept set")
    assert(bidDirs(store) === storeBids,
      "a replay must overwrite its own store slice, not add one")
    // and a THIRD commit after the replay still dedups against the
    // full history (the replayed slice wasn't lost from the store)
    Sources.commitVersion(docs.filter(col("doc_id") < 3), t)
    drain()
    assert(keptIds(out) === keptBefore,
      "post-replay batches must still match historical signatures")
  }

  test("an epoch whose publish FAILS releases its claim and deletes its " +
    "files — the retry is a fresh claim, never a mistaken duplicate") {
    val root = tmp("pubfail")
    val dir = s"$root/t"
    import org.apache.spark.sql.types._
    // declared schema k BOOLEAN vs epoch write schema k LONG (upcasts
    // in neither direction): the declared-carry evolution check throws
    // BEFORE any manifest publish — a deterministic injection at
    // exactly the claim->publish window
    Sources.createEmptyTable(dir, StructType(Seq(StructField("k", BooleanType))))
    val writeSchema = StructType(Seq(StructField("k", LongType)))
    val sw = new graft.sources.GraftStreamingWrite(spark, dir, writeSchema,
      "q-pubfail")
    spark.range(0, 5).selectExpr("id AS k").coalesce(1)
      .write.parquet(s"$root/payload")
    val part = new java.io.File(s"$root/payload").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    def stage(name: String): String = {
      val p = s"$dir/data/$name.parquet"
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(dir, "data"))
      java.nio.file.Files.copy(part.toPath, java.nio.file.Paths.get(p))
      p
    }
    val f1 = stage("epoch-fail-1")
    val marker = java.nio.file.Paths.get(dir, "_streams", "q-pubfail",
      "e5.commit")
    val vBefore = Sources.latestVersion(dir)
    intercept[IllegalArgumentException] {
      sw.commit(5L, Array(graft.sources.GraftWriteMessage(Seq(f1))))
    }
    assert(Sources.latestVersion(dir) === vBefore, "nothing published")
    assert(!java.nio.file.Files.exists(marker),
      "a failed publish must release the epoch claim")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(f1)),
      "a failed publish must delete the stranded task files")
    // the RETRY claims afresh — were the marker left 'pending', the
    // retry would adopt the deleted files and publish an empty epoch
    val f2 = stage("epoch-fail-2")
    intercept[IllegalArgumentException] {
      sw.commit(5L, Array(graft.sources.GraftWriteMessage(Seq(f2))))
    }
    assert(!java.nio.file.Files.exists(marker))
    assert(Sources.latestVersion(dir) === vBefore)
  }

  test("a hand-corrupted epoch marker fails LOUDLY instead of guessing " +
    "at re-publish") {
    val root = tmp("tornmarker")
    val dir = s"$root/t"
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", LongType)))
    spark.range(0, 5).selectExpr("id AS k").coalesce(1)
      .write.parquet(s"$root/payload")
    val part = new java.io.File(s"$root/payload").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Sources.commitVersion(spark.read.parquet(s"$root/payload"), dir)
    // external corruption: a marker that is neither pending nor
    // committed (the atomic claim/transition protocol cannot produce
    // this state — only outside interference can)
    val mdir = java.nio.file.Paths.get(dir, "_streams", "q-torn")
    java.nio.file.Files.createDirectories(mdir)
    java.nio.file.Files.write(mdir.resolve("e2.commit"),
      "garbage-state\n/nonexistent".getBytes("UTF-8"))
    val sw = new graft.sources.GraftStreamingWrite(spark, dir, schema, "q-torn")
    val replay = s"$dir/data/torn-replay.parquet"
    java.nio.file.Files.copy(part.toPath, java.nio.file.Paths.get(replay))
    val vBefore = Sources.latestVersion(dir)
    val e = intercept[IllegalStateException] {
      sw.commit(2L, Array(graft.sources.GraftWriteMessage(Seq(replay))))
    }
    assert(e.getMessage.contains("unparsable epoch marker"))
    assert(Sources.latestVersion(dir) === vBefore,
      "corruption must block publication, not double it")
  }

  test("replication restarted with a FRESH checkpoint keeps tracking: " +
    "the ledger is query-id-keyed, so reset batch ids skip nothing") {
    import spark.implicits._
    val root = tmp("fresh-ckpt")
    val src = s"$root/src"
    val dst = s"$root/dst"
    Sources.commitVersion(
      (0L until 50L).map(i => (i, s"v$i")).toDF("k", "v")
        .repartitionByRange(2, col("k")).sortWithinPartitions("k"), src)
    Sources.commitStats(spark, src, 1, Seq("k"))
    val q1 = StreamingPipeline.replicateTable(spark, src, dst, "k",
      s"$root/ckptA")
    q1.awaitTermination()
    def content(t: String): Map[Long, String] =
      Sources.readVersion(spark, t).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(content(dst) === content(src))
    // source advances, then the operator LOSES the checkpoint (the
    // classic ops accident) and restarts replication from scratch
    Sources.mergeVersion(spark, src,
      Seq((7L, "v7-updated")).toDF("k", "v").withColumn("op", lit("upsert"))
        .unionByName(Seq((13L, "x")).toDF("k", "v")
          .withColumn("op", lit("delete"))), "k")
    val q2 = StreamingPipeline.replicateTable(spark, src, dst, "k",
      s"$root/ckptB")
    q2.awaitTermination()
    // a batch-id-only ledger would see dst/_replication/batch-0.done
    // from run A and silently skip run B's batch 0 — the replica would
    // freeze at the old state. The query-id key gives run B its own
    // ledger; the keyed merge re-applies idempotently.
    assert(content(dst) === content(src),
      "fresh-checkpoint restart must keep tracking the source")
    assert(content(dst)(7L) === "v7-updated")
    assert(!content(dst).contains(13L))
    val ledgers = Option(new java.io.File(s"$dst/_replication").listFiles())
      .getOrElse(Array.empty).filter(_.isDirectory).map(_.getName).toSet
    assert(ledgers.size === 2,
      s"each run keeps its own query-id ledger, got $ledgers")
  }

  test("checkpointQueryId: parses the checkpoint metadata id, FAILS " +
    "LOUDLY when absent or unparsable (a silent fallback would merge " +
    "every run into one ledger)") {
    val root = tmp("qid")
    intercept[IllegalStateException] {
      StreamingPipeline.checkpointQueryId(s"$root/nope")
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "metadata"),
      """{"id":"abc-123"}""".getBytes("UTF-8"))
    assert(StreamingPipeline.checkpointQueryId(root) === "abc-123")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "metadata"),
      "not json at all".getBytes("UTF-8"))
    intercept[IllegalStateException] {
      StreamingPipeline.checkpointQueryId(root)
    }
  }

  test("incremental dedup restarted with a FRESH checkpoint over the " +
    "same persistent store keeps its history: run-keyed slots mean a " +
    "reset batch 0 cannot clobber (and self-exclude) run A's bands") {
    val root = tmp("fresh-dedup")
    val t = s"$root/docs"
    val store = s"$root/store"
    val docs = Tables.documents(spark, sf).select("doc_id", "text", "lang")
    val n = docs.count()
    val cut = n / 2
    // run A sees the first half of the corpus
    Sources.commitVersion(docs.filter(col("doc_id") < cut), t)
    StreamingPipeline.cdfDedupQuery(spark, t, store, s"$root/outA")
      .awaitTermination()
    val keptA = keptIds(s"$root/outA")
    // the checkpoint is LOST (outB has its own) but the store persists;
    // run B starts at batch 0 over the SAME store and must treat run
    // A's bid=<runA>_0 slot as history, not its own replay slice
    Sources.commitVersion(docs.filter(col("doc_id") >= cut), t)
    StreamingPipeline.cdfDedupQuery(spark, t, store, s"$root/outB")
      .awaitTermination()
    // oracle: the one-shot batch rule over the full corpus (drop b iff
    // some a < b shares a band signature). Run B re-reads the WHOLE
    // table (fresh checkpoint = CDF from version 0): the re-delivered
    // first-half docs must ALL drop (they match their own run-A bands
    // in the store — already emitted once, never emitted twice), and
    // the second half must dedup against run A's history. Were batch
    // 0's slot a bare bid=0, it would OVERWRITE run A's bid=0 bands
    // AND self-exclude them — run B would keep first-half docs again
    // (duplicate emission) and miss cross-half collisions.
    val bands = graft.operators.DedupOps.bandsOf(docs)
    val droppedExpect = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("b.doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    val batchKept = docs.select("doc_id")
      .collect().map(_.getLong(0)).toSet -- droppedExpect
    val keptB = keptIds(s"$root/outB")
    assert(keptA.intersect(keptB).isEmpty,
      "a survivor must never be emitted by both runs")
    assert((keptA ++ keptB) === batchKept,
      "across the checkpoint loss, emitted-once survivors must equal " +
        "the single-shot batch verdict")
    val slots = Option(new java.io.File(store).listFiles())
      .getOrElse(Array.empty).filter(_.isDirectory).map(_.getName).toSet
    assert(slots.count(_.startsWith("bid=")) === slots.size &&
      slots.map(_.stripPrefix("bid=").takeWhile(_ != '_')).size >= 2,
      s"expected slots from two distinct runs, got $slots")
  }

  test("TextIndex net maintainer KILLED between the eq merges and the " +
    "termstats commit: the intent-pinned range replays VERBATIM — no " +
    "loss, no double counting") {
    import graft.functions.TextIndex
    val root = tmp("netfault-text")
    val src = s"$root/docs"
    val idx = s"$root/idx"
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang").filter(col("doc_id") < 120)
    Sources.commitVersion(docs.filter(col("doc_id") < 60), src)
    graft.sources.RowIds.enableRowIds(src)
    TextIndex.init(idx)
    TextIndex.maintainNetQuery(spark, src, idx, s"$root/ckpt1")
      .awaitTermination()
    // the range that will crash mid-application: an insert + an
    // in-place update (so the additive delta has BOTH signs in flight)
    Sources.commitVersion(docs.filter(col("doc_id") >= 60), src)
    Sources.updateWhere(spark, src, col("doc_id") % 13 === 0,
      Map("text" -> concat(lit("zz faultword "), col("text"))))
    TextIndex.midApplyCrashHook =
      () => throw new RuntimeException("injected crash")
    try intercept[Exception] {
      TextIndex.maintainNetQuery(spark, src, idx, s"$root/ckpt2")
        .awaitTermination()
    } finally TextIndex.midApplyCrashHook = () => ()
    // the crash landed AFTER the postings/docstore merges, BEFORE the
    // termstats+ledger commit: the range must still be pinned
    import scala.jdk.CollectionConverters._
    val pins = java.nio.file.Files
      .list(java.nio.file.Paths.get(idx, "_netmaintain"))
      .iterator().asScala.map(_.getFileName.toString).toSeq
    assert(pins.exists(_.endsWith(".intent")),
      s"the crashed range must stay intent-pinned, got $pins")
    // recovery drain from a FRESH checkpoint (the worst case): the
    // pinned range replays verbatim, then the ledger advances
    TextIndex.maintainNetQuery(spark, src, idx, s"$root/ckpt3")
      .awaitTermination()
    val expectedDocs = docs.withColumn("text",
      when(col("doc_id") % 13 === 0,
        concat(lit("zz faultword "), col("text"))).otherwise(col("text")))
    val toks = expectedDocs.select(col("doc_id"),
        explode(split(lower(col("text")), "\\s+")).as("term"))
      .filter(col("term") =!= "")
    val posts = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    assert(Sources.readVersion(spark, s"$idx/postings")
      .collect().map(_.toSeq).toSet ===
      posts.collect().map(_.toSeq).toSet,
      "postings after recovery must equal the from-scratch tokenization")
    assert(Sources.readVersion(spark, s"$idx/termstats")
      .filter(col("term").isNotNull).select("term", "cnt")
      .collect().map(_.toSeq).toSet ===
      toks.groupBy("term").agg(count(lit(1)).as("cnt"))
        .collect().map(_.toSeq).toSet,
      "term totals after recovery must show no loss and no double count")
    // and the pin is swept once its range is applied through
    val pinsAfter = java.nio.file.Files
      .list(java.nio.file.Paths.get(idx, "_netmaintain"))
      .iterator().asScala.map(_.getFileName.toString).toSeq
    assert(!pinsAfter.exists(_.endsWith(".intent")),
      s"applied pins must be swept, got $pinsAfter")
  }

  test("AnnIndex net maintainer KILLED before its single atomic merge: " +
    "the range replays whole on the next drain") {
    import graft.functions.AnnIndex
    val root = tmp("netfault-ann")
    val src = s"$root/emb"
    val idx = s"$root/idx"
    val emb = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding", "label")
    Sources.commitVersion(emb.filter(col("vec_id") < 100), src)
    graft.sources.RowIds.enableRowIds(src)
    AnnIndex.init(spark, src, idx)
    val model = AnnIndex.loadModel(idx)
    AnnIndex.maintainNetQuery(spark, src, idx, s"$root/ckpt1")
      .awaitTermination()
    Sources.commitVersion(
      emb.filter(col("vec_id") >= 100 && col("vec_id") < 160), src)
    Sources.updateWhere(spark, src, col("vec_id") === 3,
      Map("embedding" -> reverse(col("embedding"))))
    AnnIndex.preMergeCrashHook =
      () => throw new RuntimeException("injected crash")
    try intercept[Exception] {
      AnnIndex.maintainNetQuery(spark, src, idx, s"$root/ckpt2")
        .awaitTermination()
    } finally AnnIndex.preMergeCrashHook = () => ()
    // nothing landed: the index is exactly the pre-crash state
    def content(): Set[(Long, Long, Seq[Int])] =
      Sources.readVersion(spark, idx).filter(col("b_id") >= 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getSeq[Int](2))).toSet
    def rebuild(df: org.apache.spark.sql.DataFrame) =
      AnnIndex.encode(df, model).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2))).toSet
    assert(content() === rebuild(emb.filter(col("vec_id") < 100)),
      "a pre-merge crash must leave the index untouched (atomicity)")
    // recovery drain: the whole range replays and lands once
    AnnIndex.maintainNetQuery(spark, src, idx, s"$root/ckpt3")
      .awaitTermination()
    assert(content() === rebuild(
      emb.filter(col("vec_id") < 160)
        .withColumn("embedding", when(col("vec_id") === 3,
          reverse(col("embedding"))).otherwise(col("embedding")))))
  }

  test("DedupStore maintainer KILLED before its single atomic merge: " +
    "the store is bitwise untouched and the range replays whole") {
    import graft.streaming.DedupStore
    val root = tmp("netfault-dedup")
    val src = s"$root/docs"
    val store = s"$root/store"
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    Sources.commitVersion(docs.filter(pmod(col("doc_id"), lit(3)) === 0), src)
    DedupStore.maintainQuery(spark, src, store, s"$root/ck1",
      DedupStore.headDigest).awaitTermination()
    def content(): Set[(String, String, Long)] =
      Sources.readVersion(spark, store).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val preCrash = content()
    val vPre = Sources.latestVersion(store)
    // a second range: new docs AND an erasure that takes survivors out
    Sources.commitVersion(docs.filter(pmod(col("doc_id"), lit(3)) === 1), src)
    Sources.deleteWhereDv(spark, src, pmod(col("doc_id"), lit(11)) === 0)
    DedupStore.preMergeCrashHook =
      () => throw new RuntimeException("injected crash")
    try intercept[Exception] {
      DedupStore.maintainQuery(spark, src, store, s"$root/ck2",
        DedupStore.headDigest).awaitTermination()
    } finally DedupStore.preMergeCrashHook = () => ()
    assert(content() === preCrash && Sources.latestVersion(store) === vPre,
      "a pre-merge crash must leave the store bitwise untouched")
    // recovery on a THIRD checkpoint: the crashed range replays whole
    DedupStore.maintainQuery(spark, src, store, s"$root/ck3",
      DedupStore.headDigest).awaitTermination()
    val live = Sources.readVersion(spark, src)
    val want = live
      .groupBy(DedupStore.headDigest(col("text")).as("digest"))
      .agg(min(col("doc_id")).as("survivor_id"))
      .orderBy("digest").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = DedupStore.survivors(spark, store).orderBy("digest")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === want,
      "the recovery drain must land the crashed range exactly once")
  }
}
