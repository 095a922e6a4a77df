package graft

import graft.sources.{Backfill, Sources}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The resumable chunked backfill ([[Backfill.run]]): chunk accounting,
  * crash-at-chunk-N resume (finished chunks never re-run, the torn
  * chunk redoes idempotently), chunked ≡ one-shot equivalence, and the
  * key-column contract guards.
  */
class BackfillSpec extends SparkTestBase {
  import spark.implicits._

  private def freshRoot(tag: String) = {
    val r = java.nio.file.Files.createTempDirectory(tag)
    r.toFile.deleteOnExit()
    r
  }

  private def tokenWork(slice: DataFrame): DataFrame =
    slice.select(concat(lit("r:"), col("doc_id")).as("k"), col("doc_id"),
      size(regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0)))
        .cast("long").as("n_tokens"))

  test("chunk accounting: every chunk runs once, reruns skip everything, " +
    "and the assembled output equals the one-shot transform") {
    val root = freshRoot("bf-acct")
    val src = root.resolve("src").toString
    val out = root.resolve("out").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    Sources.commitVersion(docs, src)
    val n = Backfill.run(spark, src, out, "doc_id", 100L, tokenWork)
    val ids = docs.agg(min("doc_id"), max("doc_id")).head
    val expChunks =
      (Math.floorDiv(ids.getLong(1), 100L) -
        Math.floorDiv(ids.getLong(0), 100L) + 1).toInt
    assert(n === expChunks, s"expected $expChunks chunks, applied $n")
    assert(Backfill.appliedChunks(spark, out).size === expChunks)
    val got = Backfill.result(spark, out)
      .select("doc_id", "n_tokens").orderBy("doc_id").collect()
      .map(r => (r.getLong(1 - 1), r.getLong(1))).toSeq
    val want = tokenWork(docs).select("doc_id", "n_tokens")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === want, "chunked backfill must equal the one-shot pass")
    // a second run over the same ledger is a provable no-op
    val vDone = Sources.latestVersion(out)
    assert(Backfill.run(spark, src, out, "doc_id", 100L, tokenWork) === 0)
    assert(Sources.latestVersion(out) === vDone,
      "a fully-ledgered rerun must commit nothing")
  }

  test("crash at chunk N: finished chunks never re-run on resume, the " +
    "torn chunk redoes idempotently, endpoint equals one-shot") {
    val root = freshRoot("bf-crash")
    val src = root.resolve("src").toString
    val out = root.resolve("out").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    Sources.commitVersion(docs, src)
    val worked = scala.collection.mutable.ArrayBuffer.empty[Long]
    def countingWork(slice: DataFrame): DataFrame = tokenWork(slice)
    Backfill.preMergeCrashHook = c => {
      worked += c
      if (worked.size == 3) throw new RuntimeException("injected crash")
    }
    try intercept[RuntimeException] {
      Backfill.run(spark, src, out, "doc_id", 100L, countingWork)
    } finally Backfill.preMergeCrashHook = _ => ()
    assert(worked.size === 3)
    assert(Backfill.appliedChunks(spark, out).size === 2,
      "the crashed chunk must NOT be ledgered")
    // resume: only the torn chunk and the remainder run
    val before = Backfill.appliedChunks(spark, out)
    val resumed = scala.collection.mutable.ArrayBuffer.empty[Long]
    Backfill.preMergeCrashHook = c => { resumed += c; () }
    try assert(Backfill.run(spark, src, out, "doc_id", 100L, tokenWork) ===
      resumed.size)
    finally Backfill.preMergeCrashHook = _ => ()
    assert(resumed.toSet.intersect(before).isEmpty,
      "finished chunks must never re-run on resume")
    assert(resumed.contains(worked.last), "the torn chunk must redo")
    val got = Backfill.result(spark, out)
      .select("doc_id", "n_tokens").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = tokenWork(docs).select("doc_id", "n_tokens")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === want,
      "after crash + resume the output must equal the one-shot pass")
  }

  test("contract guards: missing key column and absurdly sparse id " +
    "spaces refuse loudly") {
    val root = freshRoot("bf-guard")
    val src = root.resolve("src").toString
    Sources.commitVersion(
      Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text"), src)
    val noKey = intercept[IllegalArgumentException] {
      Backfill.run(spark, src, root.resolve("o1").toString, "doc_id", 10L,
        slice => slice.select(col("doc_id")))
    }
    assert(noKey.getMessage.contains("key column 'k'"))
    val sparse = root.resolve("sp").toString
    Sources.commitVersion(
      Seq((0L, "a"), (Long.MaxValue / 2, "b")).toDF("doc_id", "text"),
      sparse)
    val tooSparse = intercept[IllegalArgumentException] {
      Backfill.run(spark, sparse, root.resolve("o2").toString, "doc_id",
        10L, tokenWork)
    }
    assert(tooSparse.getMessage.contains("too sparse"))
  }
}
