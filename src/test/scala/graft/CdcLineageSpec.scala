package graft

import graft.sources.{RowIds, Sources}
import org.apache.spark.sql.functions._

/** [[Sources.updateWhere]] (id-preserving copy-on-write UPDATE) and
  * [[RowIds.readChangesLineage]] (the net change feed): rewrites net
  * to an empty feed, in-place updates pair as pre/postimages, and the
  * feed applied to the from-snapshot reproduces the to-snapshot. */
class CdcLineageSpec extends SparkTestBase {

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit(); d.toString
  }

  private def freshTable(name: String): String = {
    val t = tmp(name) + "/t"
    val o = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .filter(col("o_orderkey") <= 600)
    Sources.commitVersion(o.filter(col("o_orderkey") <= 300), t)
    RowIds.enableRowIds(t)
    Sources.commitVersion(o.filter(col("o_orderkey") > 300), t)
    t
  }

  private def feed(t: String, from: Int, to: Int) =
    RowIds.readChangesLineage(spark, t, from, to)

  test("updateWhere rewrites exactly the matched rows' set columns, " +
    "preserves every row id, and works without lineage too") {
    val t = freshTable("upd")
    val before = RowIds.readVersionWithRowIds(spark, t)
      .select("o_orderkey", "o_totalprice", RowIds.COL)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    val (_, n, _, _) = Sources.updateWhere(spark, t,
      col("o_orderkey") % 10 === 0,
      Map("o_totalprice" -> (col("o_totalprice") + lit(5.0d))))
    assert(n === before.keys.count(_ % 10 == 0))
    val after = RowIds.readVersionWithRowIds(spark, t)
      .select("o_orderkey", "o_totalprice", RowIds.COL)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    assert(after.keys.toSet === before.keys.toSet)
    before.foreach { case (k, (p, id)) =>
      assert(after(k)._2 === id, s"key $k must keep its row id")
      assert(after(k)._1 === (if (k % 10 == 0) p + 5.0d else p)) }
    // plain (non-lineage) tables take the same operator
    val t2 = tmp("upd-plain") + "/t"
    Sources.commitVersion(Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice")
      .filter(col("o_orderkey") <= 100), t2)
    val (_, n2, _, _) = Sources.updateWhere(spark, t2,
      col("o_orderkey") <= 50,
      Map("o_totalprice" -> lit(1.0d)))
    assert(n2 === Sources.readVersion(spark, t2)
      .filter(col("o_totalprice") === 1.0d).count())
  }

  test("updateWhere evaluates ALL assignments and the predicate " +
    "against the PRE-update row (SQL UPDATE's simultaneous semantics)") {
    import spark.implicits._
    // a=b, b=a must SWAP (a sequential fold would copy one into both,
    // with the outcome depending on Map iteration order)
    val t = tmp("upd-swap") + "/t"
    Sources.commitVersion(
      Seq((1L, 10L, 20L), (2L, 30L, 40L)).toDF("k", "a", "b"), t)
    Sources.updateWhere(spark, t, col("k") === 1L,
      Map("a" -> col("b"), "b" -> col("a")))
    val rows = Sources.readVersion(spark, t).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq === Seq((1L, 20L, 10L), (2L, 30L, 40L)),
      s"sets must swap simultaneously, got ${rows.toSeq}")
    // a predicate referencing a SET column must keep matching while
    // the remaining assignments apply: every matched row gets BOTH
    // updates, computed from pre-update values
    val t2 = tmp("upd-pred") + "/t"
    Sources.commitVersion(
      Seq((1L, 5L, 0L), (2L, 99L, 0L)).toDF("k", "a", "b"), t2)
    val (_, nUpd, _, _) = Sources.updateWhere(spark, t2, col("a") === 5L,
      Map("a" -> lit(6L), "b" -> (col("a") + 100L)))
    assert(nUpd === 1L)
    val r2 = Sources.readVersion(spark, t2).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(r2.toSeq === Seq((1L, 6L, 105L), (2L, 99L, 0L)),
      s"predicate and RHS must see pre-update values, got ${r2.toSeq}")
  }

  test("a pure layout rewrite (compaction + purge) nets to an EMPTY " +
    "feed; an in-place update pairs pre/postimages") {
    val t = freshTable("net")
    val v0 = Sources.latestVersion(t)
    Sources.compactVersion(spark, t, 64L)
    assert(feed(t, v0, Sources.latestVersion(t)).count() === 0L,
      "compaction must be invisible to the net feed")
    val v1 = Sources.latestVersion(t)
    Sources.updateWhere(spark, t, col("o_orderkey") % 10 === 0,
      Map("o_totalprice" -> (col("o_totalprice") + lit(5.0d))))
    val f = feed(t, v1, Sources.latestVersion(t))
      .select("_change_type", "o_orderkey", "o_totalprice").collect()
    val byType = f.groupBy(_.getString(0))
    val keys10 = RowIds.readVersionWithRowIds(spark, t)
      .filter(col("o_orderkey") % 10 === 0).count()
    assert(byType("update_preimage").length === keys10)
    assert(byType("update_postimage").length === keys10)
    assert(!byType.contains("insert") && !byType.contains("delete"))
    f.filter(_.getString(0) == "update_postimage").foreach { r =>
      val pre = f.find(x => x.getString(0) == "update_preimage" &&
        x.getLong(1) == r.getLong(1)).get
      assert(r.getDouble(2) === pre.getDouble(2) + 5.0d) }
  }

  test("net replication: a source compaction/purge drain commits " +
    "NOTHING on the replica; updates and deletes track exactly") {
    val root = tmp("net-repl")
    val src = s"$root/src"
    val dst = s"$root/dst"
    val ckpt = s"$root/ckpt"
    val o = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .filter(col("o_orderkey") <= 600)
    Sources.commitVersion(o.filter(col("o_orderkey") <= 300), src)
    RowIds.enableRowIds(src)
    Sources.commitVersion(o.filter(col("o_orderkey") > 300), src)
    def drain(): Unit = graft.streaming.StreamingPipeline
      .replicateTableNet(spark, src, dst, "o_orderkey", ckpt)
      .awaitTermination()
    def snap(t: String) = Sources.readVersion(spark, t)
      .collect().map(_.toSeq).toSet
    drain()
    assert(snap(dst) === snap(src))
    // pure layout work: the replica must not even commit
    Sources.compactVersion(spark, src, 64L)
    val dstV = Sources.latestVersion(dst)
    drain()
    assert(Sources.latestVersion(dst) === dstV,
      "a compaction drain must be a zero-commit no-op on the replica")
    assert(snap(dst) === snap(src))
    // real changes still flow: update + delete + purge in one drain
    Sources.updateWhere(spark, src, col("o_orderkey") % 10 === 0,
      Map("o_totalprice" -> (col("o_totalprice") + lit(1.0d))))
    Sources.deleteWhereDv(spark, src, col("o_orderkey") % 13 === 0)
    Sources.purgeDv(spark, src)
    drain()
    assert(snap(dst) === snap(src))
    // an update that CHANGES THE KEY must retire the old key on the
    // replica (the preimage's delete), not just upsert the new one
    val probe = Sources.readVersion(spark, src)
      .agg(min("o_orderkey")).head.getLong(0)
    Sources.updateWhere(spark, src, col("o_orderkey") === probe,
      Map("o_orderkey" -> lit(1000001L)))
    drain()
    assert(snap(dst) === snap(src))
    assert(Sources.readVersion(spark, dst)
      .filter(col("o_orderkey") === probe).isEmpty,
      "the pre-update key must be gone from the replica")
  }

  test("the net feed applied to the from-snapshot reproduces the " +
    "to-snapshot across a mixed lifecycle (dv delete + purge + eq " +
    "merge + update + CoW delete + append)") {
    val t = freshTable("apply")
    val o = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val from = Sources.latestVersion(t)
    val snapFrom = Sources.readVersion(spark, t).collect().map(_.toSeq)
    Sources.deleteWhereDv(spark, t, col("o_orderkey") % 7 === 0)
    Sources.purgeDv(spark, t)
    Sources.mergeVersionEq(spark, t,
      o.filter(col("o_orderkey") === 3)
        .withColumn("o_totalprice", lit(9.0d))
        .withColumn("op", lit("upsert")), Seq("o_orderkey"))
    Sources.updateWhere(spark, t, col("o_orderkey") % 10 === 1,
      Map("o_totalprice" -> (col("o_totalprice") * 2)))
    Sources.deleteWhere(spark, t, col("o_orderkey") % 13 === 0)
    Sources.commitVersion(
      o.filter(col("o_orderkey") > 600 && col("o_orderkey") <= 700), t)
    val to = Sources.latestVersion(t)
    val events = feed(t, from, to)
      .select("_change_type", "o_orderkey", "o_custkey", "o_totalprice")
      .collect()
    // apply keyed by (custkey, orderkey, price)-identity: start from
    // the from-snapshot, remove deletes + preimages, add inserts +
    // postimages — multiset equality against the to-snapshot
    def key(s: Seq[Any]) = s.map(String.valueOf(_)).mkString("|")
    val minus = events.filter(e => e.getString(0) == "delete" ||
      e.getString(0) == "update_preimage").map(e => key(e.toSeq.tail))
    val plus = events.filter(e => e.getString(0) == "insert" ||
      e.getString(0) == "update_postimage").map(e => key(e.toSeq.tail))
    def count(xs: Seq[String]) = xs.groupBy(identity).map {
      case (k, v) => k -> v.size }
    val applied = count(snapFrom.map(key) ++ plus)
      .map { case (k, n) => k -> (n - count(minus.toSeq).getOrElse(k, 0)) }
      .filter(_._2 > 0)
    val snapTo = count(Sources.readVersion(spark, t)
      .collect().map(r => key(r.toSeq)).toSeq)
    assert(applied === snapTo,
      "from-snapshot + net feed must equal the to-snapshot")
    // and the eq-upserted key surfaced as pre/post or delete+insert
    // with the right final image
    assert(events.exists(e => e.getLong(1) === 3L &&
      (e.getString(0) == "insert" || e.getString(0) == "update_postimage")
      && e.getDouble(3) === 9.0d))
  }

  test("DERIVED replica: a transform+filter maintained off the net " +
    "feed tracks the batch recompute; compaction still commits " +
    "nothing; an edit re-derives and can cross the filter") {
    val root = tmp("derived-repl")
    val src = s"$root/src"
    val dst = s"$root/dst"
    val ckpt = s"$root/ckpt"
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text")
    Sources.commitVersion(docs.filter(pmod(col("doc_id"), lit(2)) === 0), src)
    RowIds.enableRowIds(src)
    Sources.commitVersion(docs.filter(pmod(col("doc_id"), lit(2)) === 1), src)
    val derive = graft.functions.TextOps.deriveClean
    def drain(): Unit = graft.streaming.StreamingPipeline
      .replicateTableNet(spark, src, dst, "doc_id", ckpt, derive)
      .awaitTermination()
    def recompute() = derive(Sources.readVersion(spark, src))
    def assertEq(tag: String): Unit = {
      val v = Sources.readVersion(spark, dst)
        .select("doc_id", "lang", "n_tokens", "clean_len", "digest")
      val r = recompute()
      assert(v.exceptAll(r).count() + r.exceptAll(v).count() === 0L,
        s"$tag: derived replica != batch recompute")
    }
    drain(); assertEq("after initial commits")
    // pure layout work: the DERIVED table must not even commit
    Sources.compactVersion(spark, src, 64L)
    val dstV = Sources.latestVersion(dst)
    drain()
    assert(Sources.latestVersion(dst) === dstV,
      "a compaction drain must be a zero-commit no-op on the derived " +
        "table")
    assertEq("after compaction")
    // an in-place edit re-derives; shrinking a doc BELOW the filter
    // threshold must DROP it from the derived table (preimage retires,
    // postimage is filtered out and never lands)
    val victim = Sources.readVersion(spark, dst)
      .agg(min("doc_id")).head.getLong(0)
    Sources.updateWhere(spark, src, col("doc_id") === victim,
      Map("text" -> lit("too short now")))
    Sources.deleteWhereDv(spark, src, pmod(col("doc_id"), lit(13)) === 0)
    drain()
    assertEq("after edit + erasure")
    assert(Sources.readVersion(spark, dst)
      .filter(col("doc_id") === victim).isEmpty,
      "a doc edited below the quality screen must leave the derived " +
        "table")
  }
}
