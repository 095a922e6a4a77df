package graft

import graft.sources.Sources
import org.apache.spark.sql.functions._

/** Round-6 catalog surface: ALTER TABLE DROP COLUMN / ALTER COLUMN TYPE
  * (metadata-only commits, old versions pinned) and the SQL-callable
  * maintenance procedures (`CALL g.system.*`). */
class CatalogEvolutionSpec extends SparkTestBase {

  private def freshCat(name: String): (String, String) = {
    val wh = java.nio.file.Files.createTempDirectory(name)
    wh.toFile.deleteOnExit()
    val cat = s"ce${math.abs(wh.hashCode)}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    (cat, wh.toString)
  }

  test("ADD -> WIDEN -> DROP lifecycle: metadata-only commits, mixed " +
    "file generations read under the evolved schema, old versions pinned") {
    val (cat, wh) = freshCat("evolve")
    spark.sql(s"CREATE TABLE $cat.ev (k BIGINT, v INT)")
    spark.sql(s"INSERT INTO $cat.ev VALUES (1, 10), (2, 20)")
    // ADD COLUMN: new files carry it, old files null-fill
    spark.sql(s"ALTER TABLE $cat.ev ADD COLUMN tag STRING")
    spark.sql(s"INSERT INTO $cat.ev VALUES (3, 30, 'x')")
    val vPreWiden = Sources.latestVersion(s"$wh/ev")
    // WIDEN v INT -> BIGINT: pre-widen int32 files read through the
    // parquet reader's widening promotion, no rewrite
    val filesPre = Sources.history(spark, s"$wh/ev").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    spark.sql(s"ALTER TABLE $cat.ev ALTER COLUMN v TYPE BIGINT")
    assert(Sources.history(spark, s"$wh/ev").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
      .apply(Sources.latestVersion(s"$wh/ev")) === filesPre(vPreWiden),
      "a type widening must be a metadata-only commit")
    assert(spark.table(s"$cat.ev").schema("v").dataType ===
      org.apache.spark.sql.types.LongType)
    spark.sql(s"INSERT INTO $cat.ev VALUES (4, 4000000000, 'y')")
    val rows = spark.sql(s"SELECT k, v FROM $cat.ev ORDER BY k").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 4000000000L)))
    // DROP COLUMN tag: leaves the read surface, bytes linger until
    // compaction; old version still serves it
    spark.sql(s"ALTER TABLE $cat.ev DROP COLUMN tag")
    assert(!spark.table(s"$cat.ev").schema.fieldNames.contains("tag"))
    assert(spark.sql(s"SELECT * FROM $cat.ev").columns.toSeq ===
      Seq("k", "v"))
    // a later insert needs no tag; a rewrite does not resurrect it
    spark.sql(s"INSERT INTO $cat.ev VALUES (5, 50)")
    spark.sql(s"DELETE FROM $cat.ev WHERE k = 1")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.ev").head().getLong(0) === 4)
    assert(spark.sql(s"SELECT * FROM $cat.ev").columns.toSeq ===
      Seq("k", "v"))
    // time travel: the pre-drop version still has tag; pre-widen
    // version still types v as INT
    val pinned = spark.sql(
      s"SELECT * FROM $cat.ev VERSION AS OF $vPreWiden")
    assert(pinned.columns.toSeq === Seq("k", "v", "tag"))
    assert(pinned.schema("v").dataType ===
      org.apache.spark.sql.types.IntegerType)
    assert(pinned.count() === 3)
    // guards: narrowing fails loudly (Spark's analyzer enforces the
    // canUpCast contract before our arm — either layer may fire)
    val narrowMsg = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.ev ALTER COLUMN v TYPE INT")
    }.getMessage.toLowerCase
    assert(narrowMsg.contains("widen") ||
      narrowMsg.contains("not_supported_change_column"))
    assert(intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.ev DROP COLUMN nope")
    }.getMessage.contains("nope"))
    spark.sql(s"DROP TABLE $cat.ev")
  }

  test("CALL g.system.*: analyze, optimize, purge_dv, rollback, vacuum " +
    "drive the maintenance commits from pure SQL") {
    val (cat, wh) = freshCat("proc")
    val t = s"$wh/m"
    spark.sql(s"CREATE TABLE $cat.m (k BIGINT, v DOUBLE)")
    Tables.orders(spark, sf).select(col("o_orderkey").as("k"),
      col("o_totalprice").as("v")).createOrReplaceTempView("proc_src")
    spark.sql(s"INSERT INTO $cat.m SELECT * FROM proc_src WHERE k % 2 = 0")
    spark.sql(s"INSERT INTO $cat.m SELECT * FROM proc_src WHERE k % 2 = 1")
    val total = spark.sql(s"SELECT COUNT(*) FROM $cat.m").head().getLong(0)
    // analyze: stats sidecar via SQL
    val an = spark.sql(s"CALL $cat.system.analyze('m', 'k')").collect()
    assert(an.head.getInt(1) === 1)
    assert(Sources.statsOf(t, Sources.latestVersion(t)).nonEmpty)
    // DV delete then purge via SQL
    spark.sql(s"DELETE FROM $cat.m WHERE k IN (2, 4)")
    assert(Sources.dvRowCount(t, Sources.latestVersion(t)) > 0)
    val pd = spark.sql(s"CALL $cat.system.purge_dv('m')").collect()
    assert(pd.head.getInt(1) >= 1)
    assert(Sources.dvOf(t, Sources.latestVersion(t)).isEmpty)
    val afterDel = spark.sql(s"SELECT COUNT(*) FROM $cat.m")
      .head().getLong(0)
    // optimize: compaction commit, row count stable
    val opt = spark.sql(
      s"CALL $cat.system.optimize('m', target_records => 1000000)")
      .collect()
    assert(opt.head.getInt(2) <= opt.head.getInt(1))
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.m").head().getLong(0)
      === afterDel)
    // rollback to v2 (first insert only)
    val rb = spark.sql(s"CALL $cat.system.rollback('m', 2)").collect()
    assert(rb.head.getInt(0) === Sources.latestVersion(t))
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.m").head().getLong(0)
      === spark.sql("SELECT COUNT(*) FROM proc_src WHERE k % 2 = 0")
        .head().getLong(0))
    // vacuum: expire history, head still reads
    val vc = spark.sql(s"CALL $cat.system.vacuum('m', keep_last => 1)")
      .collect()
    assert(vc.head.getInt(0) >= 1)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.m").head().getLong(0)
      === spark.sql("SELECT COUNT(*) FROM proc_src WHERE k % 2 = 0")
        .head().getLong(0))
    spark.sql(s"DROP TABLE $cat.m")
  }

  test("mergeSchema opt-in: a DV merge carrying a new column + a type " +
    "widening evolves the declared schema; partitioned tables keep " +
    "their partition column; the flag off drops the column silently") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mse-dv")
    dir.toFile.deleteOnExit()
    val t = s"$dir/t"
    val tp = s"$dir/tp"
    val base = Seq((1L, 10, "a"), (2L, 20, "b"), (3L, 30, "a"))
      .toDF("k", "cnt", "g")
    val v1 = Sources.commitVersion(base, t)
    // cnt arrives widened (INT -> BIGINT) and a new column rides along
    val changes = Seq((2L, 200L, "b", "x", "upsert"),
      (4L, 400L, "c", "y", "upsert"))
      .toDF("k", "cnt", "g", "extra", "op")
    spark.conf.set("spark.graft.mergeSchema", "true")
    try {
      val (_, marked, usedDv) = Sources.mergeVersionDv(spark, t, changes, "k")
      assert(usedDv && marked === 1L)
      val head = Sources.readVersion(spark, t).orderBy("k")
      assert(head.schema("cnt").dataType ===
        org.apache.spark.sql.types.LongType, "cnt must widen to BIGINT")
      assert(head.columns.contains("extra"))
      val rows = head.select("k", "cnt", "extra")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          Option(r.getString(2)).getOrElse("-")))
      assert(rows.toSeq === Seq((1L, 10L, "-"), (2L, 200L, "x"),
        (3L, 30L, "-"), (4L, 400L, "y")),
        "old rows null-fill the new column; upserts carry it")
      // pre-evolution version pinned: no extra column, INT cnt
      val pinned = Sources.readVersion(spark, t, v1)
      assert(!pinned.columns.contains("extra"))
      assert(pinned.schema("cnt").dataType ===
        org.apache.spark.sql.types.IntegerType)
      // partitioned table: evolution must keep the partition column
      Sources.writeTableProperties(tp, Map("partition.columns" -> "g"))
      Sources.commitVersion(base, tp)
      val (_, _, ok2) = Sources.mergeVersionDv(spark, tp, changes, "k")
      assert(ok2)
      val headP = Sources.readVersion(spark, tp)
      assert(headP.columns.toSet === Set("k", "cnt", "g", "extra"))
      assert(headP.filter(col("g").isNull).count() === 0,
        "partition column must survive evolution")
      assert(headP.filter(col("extra") === "y").count() === 1)
    } finally spark.conf.unset("spark.graft.mergeSchema")
    // flag OFF: an unknown column drops silently (alignment selects
    // the table's shape), and a WIDENED type still fails loudly —
    // silent truncation is never on the table
    val t2 = s"$dir/t2"
    Sources.commitVersion(base, t2)
    val sameTyped = Seq((2L, 200, "b", "x", "upsert"))
      .toDF("k", "cnt", "g", "extra", "op")
    Sources.mergeVersionDv(spark, t2, sameTyped, "k")
    assert(!Sources.readVersion(spark, t2).columns.contains("extra"))
    val e = intercept[IllegalArgumentException] {
      Sources.mergeVersionDv(spark, t2, changes, "k") // cnt LONG vs INT
    }
    assert(e.getMessage.contains("widen"),
      s"narrowing without the flag must fail loudly, got: $e")
  }
}
