package graft

import graft.sources.{ManifestFileIndex, Sources}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Merge-on-read MERGE ([[Sources.mergeVersionDv]]): a keyed CDC batch
  * of point updates/deletes/inserts lands as DV marks + one appended
  * batch — NO base file rewritten — with semantics proven equal to the
  * copy-on-write [[Sources.mergeVersion]] on a twin table, the CDF
  * emitting updates as delete+insert, purge absorbing, and wide deltas
  * falling back to copy-on-write. */
class MorMergeSpec extends SparkTestBase {

  private def freshTable(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    d.resolve("t").toString
  }

  private def ordersBase = Tables.orders(spark, sf)
    .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")

  private def manifestFiles(table: String, v: Int): Seq[String] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(table, s"v$v.manifest")).asScala.toSeq
      .filter(_.nonEmpty)
  }

  private def mkTable(name: String): (String, Int) = {
    val t = freshTable(name)
    val v1 = Sources.commitVersion(
      ordersBase.repartitionByRange(6, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey"), t)
    Sources.commitStats(spark, t, v1, Seq("o_orderkey"))
    (t, v1)
  }

  /** upsert 2 existing keys (price bumped), insert 1 brand-new key,
    * delete 2 keys — the canonical CDC point batch. */
  private def changeSet(): (DataFrame, Seq[Long], Seq[Long], Long) = {
    val keys = ordersBase.select("o_orderkey").orderBy("o_orderkey")
      .limit(5).collect().map(_.getLong(0)).toSeq
    val (updKeys, delKeys) = (keys.take(2), keys.drop(3))
    val newKey = ordersBase.agg(max("o_orderkey")).collect()(0)
      .getLong(0) + 1000L
    val upd = ordersBase
      .filter(col("o_orderkey").isin(updKeys: _*))
      .withColumn("o_totalprice", col("o_totalprice") + lit(1000))
      .withColumn("op", lit("upsert"))
    val ins = ordersBase.orderBy("o_orderkey").limit(1)
      .withColumn("o_orderkey", lit(newKey))
      .withColumn("op", lit("upsert"))
    val del = ordersBase
      .filter(col("o_orderkey").isin(delKeys: _*))
      .withColumn("op", lit("delete"))
    (upd.unionByName(ins).unionByName(del), updKeys, delKeys, newKey)
  }

  private def sameContent(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("a point merge appends ONE batch and marks positions: every " +
    "base file carried byte-identical, content equals the CoW twin, " +
    "both read stacks agree, pinned version intact") {
    val (t, v1) = mkTable("mor-merge")
    val (changes, updKeys, delKeys, newKey) = changeSet()
    val filesBefore = manifestFiles(t, v1)
    val (v2, marked, usedDv) =
      Sources.mergeVersionDv(spark, t, changes, "o_orderkey")
    assert(usedDv, "a 5-key merge must take the DV path")
    assert(marked === 4L,
      "2 updated + 2 deleted stored rows are marked; the new key marks nothing")
    val filesAfter = manifestFiles(t, v2)
    assert(filesAfter.toSet.intersect(filesBefore.toSet) ===
      filesBefore.toSet, "every base file must carry forward")
    val appended = filesAfter.toSet -- filesBefore.toSet
    assert(appended.nonEmpty &&
      appended.forall(_.contains("batch-dvmerge-")),
      s"the only new files are the upsert batch, got $appended")
    assert(Sources.dvRowCount(t, v2) === 4L)
    // equivalence: the copy-on-write merge on a twin table
    val (tw, _) = mkTable("mor-merge-twin")
    Sources.mergeVersion(spark, tw, changes, "o_orderkey")
    val head = Sources.readVersion(spark, t)
    assert(sameContent(head, Sources.readVersion(spark, tw)),
      "merge-on-read must equal copy-on-write row for row")
    // spot semantics: updated key carries the bumped price exactly once
    assert(head.filter(col("o_orderkey") === updKeys.head).count() === 1)
    assert(head.filter(col("o_orderkey").isin(delKeys: _*)).count() === 0)
    assert(head.filter(col("o_orderkey") === newKey).count() === 1)
    // the indexed (stats-skipping) read stack applies the DVs too
    assert(sameContent(ManifestFileIndex.readVersionIndexed(spark, t), head))
    // pinned pre-merge version unharmed
    assert(Sources.readVersion(spark, t, v1).count() === ordersBase.count())
  }

  test("the CDF emits an updated key as delete(old)+insert(new) in one " +
    "version, a deleted key as delete only, a new key as insert only") {
    val (t, v1) = mkTable("mor-cdf")
    val (changes, updKeys, delKeys, newKey) = changeSet()
    val (v2, _, usedDv) =
      Sources.mergeVersionDv(spark, t, changes, "o_orderkey")
    assert(usedDv)
    val feed = Sources.readChanges(spark, t, v1, v2).cache()
    def keysOf(change: String): Set[Long] =
      feed.filter(col("_change_type") === change)
        .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(keysOf("delete") === (updKeys ++ delKeys).toSet,
      "deletes = the retired stored rows of updated+deleted keys")
    assert(keysOf("insert") === (updKeys :+ newKey).toSet,
      "inserts = the appended upsert rows")
    // the insert carries the NEW value
    val bumped = feed.filter(col("_change_type") === "insert" &&
      col("o_orderkey") === updKeys.head).select("o_totalprice")
    val old = ordersBase.filter(col("o_orderkey") === updKeys.head)
      .select("o_totalprice")
    assert(bumped.exceptAll(old).count() === 1, "insert is the new row")
    feed.unpersist()
  }

  test("purgeDv absorbs the merge's marks (bounded rewrite), and a " +
    "delta wider than maxDvRows falls back to copy-on-write with " +
    "identical content") {
    val (t, _) = mkTable("mor-purge")
    val (changes, _, _, _) = changeSet()
    val (v2, _, _) = Sources.mergeVersionDv(spark, t, changes, "o_orderkey")
    val dvFiles = manifestFiles(t, v2)
      .count(f => Sources.dvRowCount(t, v2) > 0 &&
        Sources.dvOf(t, v2).contains(Sources.normalizePath(f)))
    val before = Sources.readVersion(spark, t).cache()
    val beforeRows = before.collect().toSeq
    val (v3, purged) = Sources.purgeDv(spark, t)
    assert(purged === dvFiles, "purge rewrites exactly the DV'd files")
    assert(Sources.dvRowCount(t, v3) === 0L)
    assert(sameContent(Sources.readVersion(spark, t), before))
    before.unpersist()
    // wide delta: cap maxDvRows below the matched count -> CoW fallback
    val (tw, _) = mkTable("mor-wide")
    val wide = ordersBase
      .withColumn("o_totalprice", col("o_totalprice") + lit(1))
      .withColumn("op", lit("upsert"))
    val (v2w, markedW, usedDvW) =
      Sources.mergeVersionDv(spark, tw, wide, "o_orderkey", maxDvRows = 10)
    assert(!usedDvW && markedW === -1L,
      "a table-wide update is not a point merge")
    assert(Sources.dvRowCount(tw, v2w) === 0L, "CoW path publishes no DV")
    assert(Sources.readVersion(spark, tw).count() === ordersBase.count())
    val gotSum = Sources.readVersion(spark, tw)
      .agg(sum("o_totalprice")).collect()(0).getDouble(0)
    val wantSum = ordersBase.agg(sum(col("o_totalprice") + lit(1)))
      .collect()(0).getDouble(0)
    assert(math.abs(gotSum - wantSum) < 1e-6 * math.abs(wantSum))
  }

  test("merge-on-read on an identity-PARTITIONED table: hive dirs in " +
    "the appended batch, partition column intact, content equals CoW") {
    val root = java.nio.file.Files.createTempDirectory("mor-part")
    root.toFile.deleteOnExit()
    val t = root.resolve("t").toString
    Sources.writeTableProperties(t,
      Map("partition.columns" -> "o_orderpriority"))
    val v1 = Sources.commitVersion(ordersBase, t)
    Sources.commitStats(spark, t, v1, Seq("o_orderkey"))
    val (changes, updKeys, delKeys, newKey) = changeSet()
    val (v2, marked, usedDv) =
      Sources.mergeVersionDv(spark, t, changes, "o_orderkey")
    assert(usedDv && marked === 4L)
    val appended = manifestFiles(t, v2).toSet -- manifestFiles(t, v1).toSet
    assert(appended.nonEmpty &&
      appended.forall(_.contains("o_orderpriority=")),
      s"appended batch must be hive-laid, got ${appended.take(3)}")
    val head = Sources.readVersion(spark, t)
    assert(head.filter(col("o_orderpriority").isNull).count() === 0,
      "merge must never null a partition column")
    assert(head.filter(col("o_orderkey") === newKey).count() === 1)
    assert(head.filter(col("o_orderkey").isin(delKeys: _*)).count() === 0)
    assert(head.count() === ordersBase.count() - 1)
  }
}
