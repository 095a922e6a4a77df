package graft

import graft.sources.Sources
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shallow clone ([[Sources.cloneTable]]/[[Sources.detachClone]]):
  * the zero-copy fork and, more importantly, its OPERATIONAL safety —
  * the source-side clone pin versus source vacuums, the ownership
  * guard versus clone vacuums, pending-delete-state carry, and the
  * detach lifecycle. These are the interactions that corrupt real
  * lakes when a format gets them wrong.
  */
class CloneSpec extends SparkTestBase {
  import spark.implicits._

  private def freshRoot(tag: String) = {
    val r = java.nio.file.Files.createTempDirectory(tag)
    r.toFile.deleteOnExit()
    r
  }

  private def rows(n: Int, tag: String): DataFrame =
    (1 to n).map(i => (i.toLong, s"$tag text $i")).toDF("id", "text")

  private def content(t: String): Seq[(Long, String)] =
    Sources.readVersion(spark, t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

  private def parquetsUnder(p: String): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(p)
    if (!java.nio.file.Files.exists(root)) Seq.empty
    else java.nio.file.Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq
  }

  test("a clone copies zero data bytes, reads identically, and the two " +
    "tables diverge independently") {
    val root = freshRoot("clone-zero")
    val src = root.resolve("src").toString
    val dst = root.resolve("dst").toString
    Sources.commitVersion(rows(100, "a"), src)
    Sources.commitVersion(rows(100, "a").withColumn("id", col("id") + 100), src)
    val before = content(src)
    Sources.cloneTable(spark, src, dst)
    // zero-copy: the clone's tree holds NO data parquet (the eq dir
    // would be the only copied parquet, and there are no eq entries)
    assert(parquetsUnder(s"$dst/data").isEmpty,
      "clone copied data files — it must share the source's")
    assert(content(dst) == before)
    // divergence: each side's write is invisible to the other
    Sources.deleteWhereDv(spark, src, col("id") <= 50)
    Sources.commitVersion(rows(10, "dst-only")
      .withColumn("id", col("id") + 1000), dst)
    assert(content(src) == before.filter(_._1 > 50))
    assert(content(dst) == before ++
      (1 to 10).map(i => (i + 1000L, s"dst-only text $i")))
  }

  test("the clone pin defeats a source vacuum; detach releases it and " +
    "the next source vacuum sweeps the then-unshared bytes") {
    val root = freshRoot("clone-pin")
    val src = root.resolve("src").toString
    val dst = root.resolve("dst").toString
    Sources.commitVersion(rows(100, "a"), src)
    Sources.cloneTable(spark, src, dst)
    val shared = parquetsUnder(s"$src/data")
    assert(shared.nonEmpty)
    val expect = content(dst)
    // source moves on (an overwrite drops every shared file from its
    // own head) and vacuums aggressively
    Sources.commitVersion(rows(5, "b"), src, overwrite = true)
    Sources.vacuumVersions(src, keepLast = 1)
    assert(shared.forall(java.nio.file.Files.exists(_)),
      "source vacuum deleted bytes a live clone still references")
    assert(content(dst) == expect, "clone corrupted by source vacuum")
    // detach: localize, release the pin
    Sources.detachClone(spark, dst)
    assert(java.nio.file.Paths.get(src, "_clones").toFile.listFiles()
      .forall(_ => false), "detach must release the source-side pin")
    assert(content(dst) == expect)
    assert(parquetsUnder(s"$dst/data").nonEmpty,
      "detach must localize the clone's rows")
    // with the pin gone the source's sweep may finally reclaim
    Sources.vacuumVersions(src, keepLast = 1)
    assert(shared.forall(!java.nio.file.Files.exists(_)),
      "released bytes must be sweepable")
    assert(content(dst) == expect, "a detached clone owns its bytes")
  }

  test("ownership guard: a clone's own vacuum expires its references " +
    "but never deletes the source's files") {
    val root = freshRoot("clone-guard")
    val src = root.resolve("src").toString
    val dst = root.resolve("dst").toString
    Sources.commitVersion(rows(100, "a"), src)
    Sources.cloneTable(spark, src, dst)
    val srcFiles = parquetsUnder(s"$src/data")
    // localize the clone WITHOUT detach, then vacuum it: the expired
    // clone versions reference source files, which must survive
    Sources.compactVersion(spark, dst, targetRecordsPerFile = 1000L)
    Sources.vacuumVersions(dst, keepLast = 1)
    assert(srcFiles.forall(java.nio.file.Files.exists(_)),
      "the clone's vacuum deleted the SOURCE's files")
    assert(content(src) == content(dst))
  }

  test("pending merge-on-read state at the cut carries: DV marks and " +
    "equality-delete keys apply in the clone, and a later source " +
    "purge does not disturb it") {
    val root = freshRoot("clone-mor")
    val src = root.resolve("src").toString
    val dst = root.resolve("dst").toString
    Sources.commitVersion(rows(100, "a"), src)
    Sources.deleteWhereDv(spark, src, col("id") <= 10)  // DV marks
    val eqChanges = Seq((20L, "", "delete"), (21L, "", "delete"))
      .toDF("id", "text", "op")
    Sources.mergeVersionEq(spark, src, eqChanges, Seq("id")) // pending eq
    // an eq UPSERT: the new-value batch is OUTSIDE the entry's scope —
    // the clone must materialize the scope-resolved positions, not
    // rebase the entry onto its whole file list (which would delete
    // the upserted row too)
    Sources.mergeVersionEq(spark, src,
      Seq((30L, "replaced", "upsert")).toDF("id", "text", "op"), Seq("id"))
    val cutContent = content(src)
    assert(cutContent.contains((30L, "replaced")))
    Sources.cloneTable(spark, src, dst)
    assert(content(dst) == cutContent,
      "clone lost or resurrected rows under pending eq state")
    assert(Sources.eqOf(dst, 1).isEmpty,
      "the clone must carry materialized delete state, not eq entries")
    // the source absorbing ITS delete state must not disturb the clone
    Sources.purgeDv(spark, src)
    Sources.purgeEq(spark, src)
    assert(content(dst) == cutContent)
    // and the clone can absorb its own copy too
    Sources.purgeEq(spark, dst)
    Sources.purgeDv(spark, dst)
    assert(content(dst) == cutContent)
  }

  test("refusals: cloning onto an existing table and cloning a " +
    "row-lineage source both fail loudly") {
    val root = freshRoot("clone-refuse")
    val src = root.resolve("src").toString
    val dst = root.resolve("dst").toString
    Sources.commitVersion(rows(10, "a"), src)
    Sources.commitVersion(rows(10, "b"), dst)
    intercept[IllegalArgumentException] {
      Sources.cloneTable(spark, src, dst)
    }
    val rid = root.resolve("rid").toString
    Sources.commitVersion(rows(10, "c"), rid)
    graft.sources.RowIds.enableRowIds(rid)
    intercept[IllegalArgumentException] {
      Sources.cloneTable(spark, rid, root.resolve("dst2").toString)
    }
  }
}
