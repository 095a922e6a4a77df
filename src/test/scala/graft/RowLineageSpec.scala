package graft

import graft.sources.{RowIds, Sources}
import org.apache.spark.sql.functions._

/** Row lineage ([[RowIds]]): stable `_row_id` assignment at commit,
  * preserved through DV deletes, purges, compaction, and copy-on-write
  * DML; deterministic sidecar re-derivation; rollback id reuse;
  * envelope guards. */
class RowLineageSpec extends SparkTestBase {

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit(); d.toString
  }

  /** o_orderkey -> _row_id for the table head. */
  private def idsOf(t: String): Map[Long, Long] =
    RowIds.readVersionWithRowIds(spark, t)
      .select(col("o_orderkey").cast("long"), col(RowIds.COL))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def orders100 = Tables.orders(spark, sf)
    .select("o_orderkey", "o_custkey", "o_totalprice")
    .filter(col("o_orderkey") <= 600)

  test("ids assign once and survive DV delete, purge, compaction, " +
    "eq merge + purge, and CoW delete/merge — only changed rows re-id") {
    val t = tmp("rowids") + "/t"
    val o = orders100
    Sources.commitVersion(o.filter(col("o_orderkey") <= 300)
      .orderBy("o_orderkey").coalesce(1), t)
    RowIds.enableRowIds(t)
    Sources.commitVersion(o.filter(col("o_orderkey") > 300), t)
    val m0 = idsOf(t)
    assert(m0.size === o.count())
    assert(m0.values.toSeq.distinct.size === m0.size, "ids must be unique")
    // first commit was one sorted file: ids are the orderkey rank
    val firstKeys = m0.keys.filter(_ <= 300).toSeq.sorted
    firstKeys.zipWithIndex.foreach { case (k, i) =>
      assert(m0(k) === i.toLong,
        s"first-commit id of $k must equal its file position") }

    // DV delete: survivors keep ids (no files change at all)
    Sources.deleteWhereDv(spark, t, col("o_orderkey") % 7 === 0)
    val m1 = idsOf(t)
    assert(m1 === m0.filter { case (k, _) => k % 7 != 0 })

    // purge rewrites the DV'd files WITH materialized ids
    Sources.purgeDv(spark, t)
    assert(idsOf(t) === m1)

    // whole-table compaction reshuffles layout, never identity
    Sources.compactVersion(spark, t, 100L)
    assert(idsOf(t) === m1)

    // eq-merge upsert re-ids ONLY the changed keys; purge preserves
    val changedKeys = m1.keys.filter(_ % 11 == 0).toSet
    Sources.mergeVersionEq(spark, t,
      o.filter(col("o_orderkey").isin(changedKeys.toSeq: _*))
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .withColumn("op", lit("upsert")), Seq("o_orderkey"))
    val m2 = idsOf(t)
    val maxBefore = m1.values.max
    changedKeys.foreach { k =>
      assert(m2(k) > maxBefore, s"upserted key $k must draw a fresh id") }
    m1.foreach { case (k, id) =>
      if (!changedKeys.contains(k)) assert(m2(k) === id) }
    Sources.purgeEq(spark, t)
    assert(idsOf(t) === m2)

    // CoW delete: survivors keep ids
    Sources.deleteWhere(spark, t, col("o_orderkey") % 13 === 0)
    val m3 = idsOf(t)
    assert(m3 === m2.filter { case (k, _) => k % 13 != 0 })

    // CoW merge: anti-join survivors keep ids, upserts re-id
    val mergeKeys = m3.keys.take(5).toSet
    Sources.mergeVersion(spark, t,
      o.filter(col("o_orderkey").isin(mergeKeys.toSeq: _*))
        .withColumn("op", lit("upsert")), "o_orderkey")
    val m4 = idsOf(t)
    m3.foreach { case (k, id) =>
      if (!mergeKeys.contains(k)) assert(m4(k) === id) }
    mergeKeys.foreach { k =>
      assert(m4(k) > m3.values.max, s"merged key $k must re-id") }
    assert(m4.values.toSeq.distinct.size === m4.size)
  }

  test("the sidecar chain is a deterministic cache: deleting every " +
    ".rid file re-derives the identical assignment") {
    val t = tmp("rowids-det") + "/t"
    val o = orders100
    Sources.commitVersion(o.filter(col("o_orderkey") <= 300), t)
    RowIds.enableRowIds(t)
    Sources.commitVersion(o.filter(col("o_orderkey") > 300), t)
    Sources.deleteWhereDv(spark, t, col("o_orderkey") % 5 === 0)
    val before = idsOf(t)
    val d = new java.io.File(t)
    d.listFiles().filter(_.getName.matches("v\\d+\\.rid"))
      .foreach(f => assert(f.delete()))
    assert(idsOf(t) === before,
      "re-derivation from manifests + footers must reproduce the ids")
  }

  test("rollback restores the rolled-back version's ids (re-entering " +
    "files reuse their recorded assignment)") {
    val t = tmp("rowids-rb") + "/t"
    val o = orders100
    Sources.commitVersion(o.filter(col("o_orderkey") <= 300), t)
    RowIds.enableRowIds(t)
    val atV2 = idsOf(t)
    // overwrite replaces the file set entirely...
    Sources.commitVersion(o.filter(col("o_orderkey") > 300), t,
      overwrite = true)
    val atV3 = idsOf(t)
    assert(atV3.keys.forall(_ > 300))
    assert(atV3.values.min > atV2.values.max,
      "an overwrite must not recycle id space")
    // ...and rollback brings the original files AND their ids back
    Sources.rollbackTo(t, 1)
    assert(idsOf(t) === atV2)
  }

  test("vacuum persists the live chain's sidecars before sweeping " +
    "expired manifests + their .rid files; ids survive the sweep") {
    val t = tmp("rowids-vac") + "/t"
    val o = orders100
    Sources.commitVersion(o.filter(col("o_orderkey") <= 300), t)
    RowIds.enableRowIds(t)
    Sources.commitVersion(o.filter(col("o_orderkey") > 300), t)
    Sources.deleteWhereDv(spark, t, col("o_orderkey") % 5 === 0)
    Sources.purgeDv(spark, t)
    val before = idsOf(t)
    // strip the persisted sidecars so vacuum's pre-sweep ensure is
    // what must save the live chain
    new java.io.File(t).listFiles()
      .filter(_.getName.matches("v\\d+\\.rid")).foreach(_.delete())
    Sources.vacuumVersions(t, 1)
    assert(idsOf(t) === before, "ids must survive history expiry")
    val rids = new java.io.File(t).listFiles()
      .filter(_.getName.matches("v\\d+\\.rid")).map(_.getName).toSet
    val live = Sources.latestVersion(t)
    assert(rids.contains(s"v$live.rid"))
    assert(!rids.contains("v1.rid"), "expired sidecars sweep")
  }

  test("re-derivation with partially lost sidecars reuses recorded " +
    "ranges AND advances the counter past them (no duplicate ids)") {
    val t = tmp("rowids-lost") + "/t"
    val o = orders100
    Sources.commitVersion(o.filter(col("o_orderkey") <= 300)
      .repartition(1), t)
    RowIds.enableRowIds(t)
    Sources.commitVersion(o.filter(col("o_orderkey") > 300)
      .repartition(1), t, overwrite = true)
    Sources.rollbackTo(t, 1)
    val v2Original = RowIds.ridOf(t, 2)
    // lose v1/v2's sidecars; v3 (the rollback, listing v1's file at
    // its ORIGINAL range) survives as the only reuse source
    Seq(1, 2).foreach(v => java.nio.file.Files.delete(
      java.nio.file.Paths.get(t, s"v$v.rid")))
    assert(RowIds.ridOf(t, 2) === v2Original,
      "the re-derived v2 assignment must reuse v1's recorded range " +
        "and keep v2's file past it")
    val all = RowIds.ridOf(t, 2)._1.values.toSeq ++
      RowIds.ridOf(t, 1)._1.values.toSeq
    assert(all.distinct.size === all.size, "ranges must never collide")
  }

  test("the envelope guards: layouts refuse enable, disabled tables " +
    "refuse the lineage read") {
    val t = tmp("rowids-guard") + "/t"
    Sources.commitVersion(orders100, t)
    intercept[IllegalArgumentException] {
      RowIds.readVersionWithRowIds(spark, t)
    }
    val tp = tmp("rowids-guard-p") + "/tp"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(tp))
    Sources.writeTableProperties(tp, Map("partition.columns" -> "o_custkey"))
    intercept[IllegalArgumentException] { RowIds.enableRowIds(tp) }
    // a pre-existing DATA column named _row_id refuses too (the fill
    // would silently shadow and retype it)
    val tc = tmp("rowids-guard-c") + "/tc"
    Sources.commitVersion(orders100
      .withColumn(RowIds.COL, lit("user-data")), tc)
    val e = intercept[IllegalArgumentException] {
      RowIds.enableRowIds(tc)
    }
    assert(e.getMessage.contains("reserves that name"))
    // ...even when the conflicting column lives ONLY in an EARLIER
    // generation: historical reads accept any version, so an old
    // generation's _row_id data column would be silently reinterpreted
    // as materialized lineage ids
    val th = tmp("rowids-guard-h") + "/th"
    Sources.commitVersion(orders100.limit(10)
      .withColumn(RowIds.COL, lit("old-gen-data")), th)
    Sources.commitVersion(orders100.limit(10), th, overwrite = true)
    val eh = intercept[IllegalArgumentException] {
      RowIds.enableRowIds(th)
    }
    assert(eh.getMessage.contains("reserves that name"),
      "an earlier generation's _row_id column must refuse enable")
  }

  test("a caller batch supplying _row_id on a lineage table is refused " +
    "on every commit path (ids are table-assigned, never forged)") {
    import spark.implicits._
    val t = tmp("rowids-forge") + "/t"
    Sources.commitVersion(orders100.limit(20), t)
    RowIds.enableRowIds(t)
    val forged = orders100.limit(5)
      .withColumn(RowIds.COL, col("o_orderkey") * 1000L)
    val e1 = intercept[IllegalArgumentException] {
      Sources.commitVersion(forged, t)
    }
    assert(e1.getMessage.contains("table-assigned"))
    intercept[IllegalArgumentException] {
      Sources.commitVersionEvolving(forged, t)
    }
    intercept[IllegalArgumentException] {
      Sources.mergeVersionEq(spark, t,
        forged.withColumn("op", lit("upsert")), Seq("o_orderkey"))
    }
    intercept[IllegalArgumentException] {
      Sources.mergeVersion(spark, t,
        forged.withColumn("op", lit("upsert")), "o_orderkey")
    }
    // a clean batch still commits, and the fresh rows draw table ids
    val before = idsOf(t).values.toSet
    Sources.commitVersion(orders100.limit(20)
      .withColumn("o_orderkey", col("o_orderkey") + 700000L), t)
    val after = idsOf(t)
    assert(after.size === 40)
    assert(after.values.toSet.size === 40, "fresh rows must draw new ids")
    assert(before.subsetOf(after.values.toSet))
  }
}
