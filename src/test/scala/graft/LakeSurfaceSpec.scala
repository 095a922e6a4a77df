package graft

import graft.sources.Sources
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Round-3 table-format surfaces: the `USING graft` SQL datasource
  * (version pinning + file skipping with no API in sight), the
  * schema-evolution contract across ≥3 generations (add / widen /
  * rename), the join-based wide-delta merge path, and the no-stranded-
  * batch guarantees on rejected or race-losing commits. */
class LakeSurfaceSpec extends SparkTestBase {

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    d.toString
  }

  private def scansOf(df: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def go(p: SparkPlan): Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      p match {
        case a: AdaptiveSparkPlanExec => go(a.executedPlan)
        // AQE wraps materialized stages in leaf QueryStageExec nodes —
        // children is empty, the real subtree hangs off .plan
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          go(s.plan)
        case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
        case o => o.children.flatMap(go)
      }
    go(df.queryExecution.executedPlan)
  }

  test("USING graft: pure SQL reads a pinned version with file skipping") {
    val table = tmp("sqlds") + "/orders_sql"
    val orders = Tables.orders(spark, sf)
    val v1 = Sources.commitVersion(
      orders.repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey"), table)
    Sources.commitStats(spark, table, v1, Seq("o_orderkey"))

    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW g_t USING graft " +
      s"OPTIONS (path '$table')")
    val all = spark.sql("SELECT * FROM g_t")
    assert(all.count() === orders.count())

    // a plain SQL WHERE — no pruning API in sight — skips manifest files
    val filtered = spark.sql(
      "SELECT * FROM g_t WHERE o_orderkey BETWEEN 100 AND 300")
    val expected = orders
      .filter(col("o_orderkey") >= 100 && col("o_orderkey") <= 300)
    filtered.collect()
    assert(filtered.count() === expected.count() && expected.count() > 0)
    val numFiles = scansOf(filtered).map(_.metrics("numFiles").value).sum
    assert(numFiles < 8 && numFiles >= 1,
      s"expected file skipping through SQL, scanned $numFiles of 8")

    // versionAsOf pins time travel across a destructive overwrite
    Sources.commitVersion(orders.limit(10), table, overwrite = true)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW g_t1 USING graft " +
      s"OPTIONS (path '$table', versionAsOf '$v1')")
    assert(spark.sql("SELECT COUNT(*) AS n FROM g_t1").head().getLong(0)
      === orders.count())
    // the DataFrame form resolves through the same registered provider
    assert(spark.read.format("graft").load(table).count() === 10)
    assert(spark.read.format("graft").option("versionAsOf", v1)
      .load(table).count() === orders.count())
  }

  test("schema evolution: add + widen + rename across three versions, " +
    "old versions pinned, new version aligns every generation") {
    import spark.implicits._
    val t = tmp("evol") + "/t"
    val g1 = Seq((1, 10), (2, 20)).toDF("id", "price") // id int, price int
    val v1 = Sources.commitVersionEvolving(g1, t)
    val g2 = Seq((3L, 300, 30), (4L, 400, 40)).toDF("id", "price", "qty")
    val v2 = Sources.commitVersionEvolving(g2, t) // id widens, qty appends
    val g3 = Seq((5L, 500, 50)).toDF("id", "amount", "qty")
    val v3 = Sources.commitVersionEvolving(g3, t,
      renames = Map("price" -> "amount"))
    assert((v1, v2, v3) === (1, 2, 3))

    // declared schemas: v1 pinned narrow; v2 widened + extended; v3 renamed
    val s1 = Sources.declaredSchema(t, 1).get
    assert(s1.fieldNames.toSeq === Seq("id", "price"))
    assert(s1("id").dataType === IntegerType)
    val s2 = Sources.declaredSchema(t, 2).get
    assert(s2.fieldNames.toSeq === Seq("id", "price", "qty"))
    assert(s2("id").dataType === LongType)
    val s3 = Sources.declaredSchema(t, 3).get
    assert(s3.fieldNames.toSeq === Seq("id", "amount", "qty"))
    assert(s3("amount").metadata.getString(Sources.RenamedFrom) === "price")

    // v1 readers keep seeing exactly the v1 world
    assert(Sources.readVersionEvolved(spark, t, 1)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      === Set((1, 10), (2, 20)))
    // v3 readers: ids widened, price history mapped into amount,
    // pre-qty generations null-filled
    val got = Sources.readVersionEvolved(spark, t, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) -1 else r.getInt(2))).toSet
    assert(got === Set((1L, 10, -1), (2L, 20, -1),
      (3L, 300, 30), (4L, 400, 40), (5L, 500, 50)))

    // the SQL surface serves the declared schema (add/widen; a rename's
    // pre-rename files are readVersionEvolved's job and read as null)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW g_ev USING graft " +
      s"OPTIONS (path '$t', versionAsOf '2')")
    val sq = spark.sql(
      "SELECT COUNT(*) AS n, COUNT(qty) AS n_qty FROM g_ev").head()
    assert(sq.getLong(0) === 4 && sq.getLong(1) === 2)

    // vacuum sweeps sidecars with their manifests
    Sources.vacuumVersions(t, keepLast = 1)
    assert(Sources.declaredSchema(t, 1).isEmpty)
    assert(Sources.declaredSchema(t, 3).nonEmpty)
  }

  test("plain append after an evolution carries the declared schema forward; " +
    "narrowing append rejected before any manifest publish") {
    import spark.implicits._
    val t = tmp("carry") + "/t"
    Sources.commitVersionEvolving(Seq((1, 10)).toDF("id", "price"), t)
    // evolve: id int -> long, qty appended
    Sources.commitVersionEvolving(
      Seq((2L, 20, 200)).toDF("id", "price", "qty"), t)
    // a PLAIN append (no qty column) must re-declare, not fall back to
    // "footer of the lexicographically-first file" — the pre-fix failure
    // mode where evolved columns vanish from the SQL surface
    val v3 = Sources.commitVersion(Seq((3L, 30)).toDF("id", "price"), t)
    val s3 = Sources.declaredSchema(t, v3)
    assert(s3.nonEmpty, "append dropped the schema sidecar")
    assert(s3.get.fieldNames.toSeq === Seq("id", "price", "qty"))
    assert(s3.get("id").dataType === LongType)
    // the SQL surface serves all three generations under that schema
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW g_carry USING graft " +
      s"OPTIONS (path '$t')")
    val r = spark.sql(
      "SELECT COUNT(*) AS n, COUNT(qty) AS n_qty, SUM(id) AS s FROM g_carry").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === (3L, 1L, 6L))
    // datasource Append path carries too
    Seq((4L, 40, 400)).toDF("id", "price", "qty")
      .write.format("graft").mode(SaveMode.Append).save(t)
    val v4 = Sources.latestVersion(t)
    assert(Sources.declaredSchema(t, v4).get.fieldNames.toSeq
      === Seq("id", "price", "qty"))
    // incompatible batch: boolean vs declared int price — no up-cast in
    // either direction, so the append is rejected with the manifest
    // history unchanged (note int->string WOULD evolve: Spark's
    // canUpCast treats atomic->string as lossless)
    val before = Sources.latestVersion(t)
    intercept[IllegalArgumentException] {
      Sources.commitVersion(Seq((true, 1L)).toDF("price", "id"), t)
    }
    assert(Sources.latestVersion(t) === before)
    // ...and the rejected batch did not strand a data dir
    val referenced = (1 to Sources.latestVersion(t))
      .flatMap(v => readManifest(t, v))
      .map(f => java.nio.file.Paths.get(f).getParent.getFileName.toString)
      .toSet
    val onDisk = Option(new java.io.File(t, "data").listFiles())
      .getOrElse(Array.empty).filter(_.isDirectory).map(_.getName).toSet
    assert((onDisk -- referenced).isEmpty,
      s"stranded batch dirs: ${onDisk -- referenced}")
    // an OVERWRITE wipes the file set: batch schema rules again
    Sources.commitVersion(Seq((9, 9)).toDF("id", "price"), t, overwrite = true)
    assert(Sources.schemaOf(spark, t, Sources.latestVersion(t))
      .fieldNames.toSeq === Seq("id", "price"))
  }

  test("string stats prune files through the SQL surface (lang-style predicate)") {
    import spark.implicits._
    val t = tmp("strstats") + "/docs"
    // 8 files, each a single language — the text-corpus layout where
    // string skipping pays
    val langs = Seq("ar", "de", "en", "es", "fr", "it", "ja", "pt")
    val df = langs.zipWithIndex.flatMap { case (l, i) =>
      (0 until 50).map(j => (i * 50 + j, l, s"doc $j in $l"))
    }.toDF("doc_id", "lang", "body")
    val v = Sources.commitVersion(
      df.repartitionByRange(8, col("lang")).sortWithinPartitions("lang"), t)
    Sources.commitStats(spark, t, v, Seq("lang", "doc_id"))
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW g_docs USING graft " +
      s"OPTIONS (path '$t')")
    // NB: collect(), not head() — head() routes through a separate
    // limit(1) QueryExecution, leaving this frame's plan unexecuted and
    // its numFiles metrics at zero
    val q = spark.sql("SELECT COUNT(*) AS n FROM g_docs WHERE lang = 'en'")
    assert(q.collect().head.getLong(0) === 50)
    val scanned = scansOf(q).map(_.metrics("numFiles").value).sum
    assert(scanned < 8 && scanned >= 1,
      s"string-equality predicate should skip files, scanned $scanned of 8")
    // range + IN shapes prune as well, and results stay exact
    val q2 = spark.sql(
      "SELECT COUNT(*) AS n FROM g_docs WHERE lang >= 'es' AND lang <= 'fr'")
    assert(q2.collect().head.getLong(0) === 100)
    assert(scansOf(q2).map(_.metrics("numFiles").value).sum < 8)
    val q3 = spark.sql(
      "SELECT COUNT(*) AS n FROM g_docs WHERE lang IN ('ja', 'pt')")
    assert(q3.collect().head.getLong(0) === 100)
    assert(scansOf(q3).map(_.metrics("numFiles").value).sum < 8)
    // non-ASCII literal against ASCII bounds: safe, still correct
    assert(spark.sql("SELECT COUNT(*) AS n FROM g_docs WHERE lang = 'é'")
      .collect().head.getLong(0) === 0)
  }

  test("mergeVersion wide-delta path: join-based file probe matches the " +
    "driver probe and never collects change keys") {
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_orderpriority")
    import spark.implicits._
    val keyMax = orders.agg(max("o_orderkey")).head().getLong(0)
    val someKeys = orders.orderBy("o_orderkey").limit(3)
      .collect().map(_.getLong(0))
    val changes = Seq(
      (someKeys(0), 99L, "MERGED", "upsert"),
      (someKeys(1), 98L, "MERGED", "upsert"),
      (someKeys(2), 0L, "", "delete"),
      (keyMax + 1000, 97L, "MERGED-NEW", "upsert"))
      .toDF("o_orderkey", "o_custkey", "o_orderpriority", "op")

    def build(name: String): String = {
      val t = tmp(name) + "/orders_m"
      val v1 = Sources.commitVersion(
        orders.repartitionByRange(8, col("o_orderkey"))
          .sortWithinPartitions("o_orderkey"), t)
      Sources.commitStats(spark, t, v1, Seq("o_orderkey"))
      t
    }
    val tProbe = build("vmerge-probe")
    val tJoin = build("vmerge-join")
    val a = Sources.mergeVersion(spark, tProbe, changes, "o_orderkey")
    // keyProbeLimit=1 < 4 distinct keys forces the join-based path
    val b = Sources.mergeVersion(spark, tJoin, changes, "o_orderkey",
      keyProbeLimit = 1)
    assert(a === b, s"paths disagree: driver-probe $a vs join $b")
    assert(b._2 === 1 && b._3 === 7,
      s"join path should rewrite 1 / carry 7, got ${b._2} / ${b._3}")
    val ra = Sources.readVersion(spark, tProbe).orderBy("o_orderkey").collect()
    val rb = Sources.readVersion(spark, tJoin).orderBy("o_orderkey").collect()
    assert(ra.toSeq === rb.toSeq)
  }

  test("DSv2 catalog: CREATE/INSERT/DELETE/time-travel SQL routes to the " +
    "versioned format; catalog reads skip files via manifest stats") {
    import graft.sources.Sources
    val wh = tmp("gcat")
    spark.conf.set("spark.sql.catalog.g", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.g.warehouse", wh)

    // CREATE TABLE publishes v1: empty file set + declared schema
    spark.sql("CREATE TABLE g.orders_c (k BIGINT, grp STRING, v DOUBLE)")
    val dir = s"$wh/orders_c"
    assert(Sources.latestVersion(dir) === 1)
    assert(spark.sql("SELECT * FROM g.orders_c").count() === 0)

    // INSERT INTO appends through the OCC commit
    spark.sql("""INSERT INTO g.orders_c
                |SELECT id AS k, concat('g', CAST(id % 4 AS STRING)) AS grp,
                |       CAST(id AS DOUBLE) / 2 AS v
                |FROM range(0, 1000)""".stripMargin)
    assert(Sources.latestVersion(dir) === 2)
    assert(spark.sql("SELECT COUNT(*) AS n FROM g.orders_c")
      .collect().head.getLong(0) === 1000)

    // a second INSERT carries the first batch's files
    spark.sql("INSERT INTO g.orders_c SELECT id, 'late', 0.0 FROM range(1000, 1100)")
    assert(spark.sql("SELECT COUNT(*) AS n FROM g.orders_c")
      .collect().head.getLong(0) === 1100)

    // VERSION AS OF pins history through pure SQL
    assert(spark.sql("SELECT COUNT(*) AS n FROM g.orders_c VERSION AS OF 2")
      .collect().head.getLong(0) === 1000)

    // DELETE FROM ... WHERE routes to the file-granular COW delete
    spark.sql("DELETE FROM g.orders_c WHERE grp = 'late' OR k >= 1090")
    assert(spark.sql("SELECT COUNT(*) AS n FROM g.orders_c")
      .collect().head.getLong(0) === 1000)
    // pre-delete versions still readable
    assert(spark.sql("SELECT COUNT(*) AS n FROM g.orders_c VERSION AS OF 3")
      .collect().head.getLong(0) === 1100)

    // INSERT OVERWRITE publishes a replacing version
    spark.sql("INSERT OVERWRITE g.orders_c SELECT id, 'ow', 1.0 FROM range(0, 10)")
    assert(spark.sql("SELECT COUNT(*) AS n FROM g.orders_c")
      .collect().head.getLong(0) === 10)
    assert(spark.sql("SELECT COUNT(*) AS n FROM g.orders_c VERSION AS OF 4")
      .collect().head.getLong(0) === 1000)

    // catalog reads prune via manifest stats: rebuild range-clustered
    spark.sql("DROP TABLE g.orders_c")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir)))

    spark.sql("CREATE TABLE g.orders_s (k BIGINT, v DOUBLE)")
    val sDir = s"$wh/orders_s"
    Sources.commitVersion(
      spark.range(0, 10000).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
        .repartitionByRange(8, col("k")).sortWithinPartitions("k"), sDir)
    Sources.commitStats(spark, sDir, Sources.latestVersion(sDir), Seq("k"))
    val q = spark.sql("SELECT COUNT(*) AS n FROM g.orders_s WHERE k BETWEEN 100 AND 300")
    assert(q.collect().head.getLong(0) === 201)
    val scanned = scansOfV2(q)
    assert(scanned < 8 && scanned >= 1,
      s"catalog read should skip files via manifest stats, scanned $scanned of 8")

    // the DELETE is file-granular: only stats-affected files rewrite
    val vBefore = Sources.latestVersion(sDir)
    val filesBefore = readManifest(sDir, vBefore).toSet
    spark.sql("DELETE FROM g.orders_s WHERE k < 1250")
    val vAfter = Sources.latestVersion(sDir)
    val filesAfter = readManifest(sDir, vAfter).toSet
    assert((filesBefore & filesAfter).nonEmpty,
      "delete rewrote every file — stats pruning did not carry untouched files")
    assert(spark.sql("SELECT COUNT(*) AS n FROM g.orders_s")
      .collect().head.getLong(0) === 10000 - 1250)

    // ALTER TABLE ADD COLUMN: metadata-only commit, old files null-fill
    spark.sql("ALTER TABLE g.orders_s ADD COLUMN tag STRING")
    val r = spark.sql(
      "SELECT COUNT(*) AS n, COUNT(tag) AS n_tag FROM g.orders_s").collect().head
    assert(r.getLong(0) === 8750 && r.getLong(1) === 0)
    spark.sql("INSERT INTO g.orders_s SELECT 20000, 1.0, 'tagged'")
    assert(spark.sql("SELECT COUNT(tag) AS n FROM g.orders_s")
      .collect().head.getLong(0) === 1)

    spark.sql("DROP TABLE g.orders_s")
  }

  test("DSv2 catalog: MERGE INTO and UPDATE run as DELTA row-level " +
    "operations; untranslatable DELETE becomes pure DV marks") {
    import graft.sources.Sources
    val wh = tmp("gmerge")
    spark.conf.set("spark.sql.catalog.gm", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gm.warehouse", wh)
    spark.sql("CREATE TABLE gm.t (k BIGINT, v DOUBLE, tag STRING)")
    spark.sql("INSERT INTO gm.t SELECT id, CAST(id AS DOUBLE), 'base' FROM range(0, 100)")
    spark.sql("SELECT id AS k, CAST(id * 10 AS DOUBLE) AS v FROM range(90, 110)")
      .createOrReplaceTempView("gm_src")
    spark.sql("""MERGE INTO gm.t t USING gm_src src ON t.k = src.k
                |WHEN MATCHED THEN UPDATE SET v = src.v, tag = 'merged'
                |WHEN NOT MATCHED THEN INSERT (k, v, tag) VALUES (src.k, src.v, 'inserted')
                |""".stripMargin)
    val dir = s"$wh/t"
    assert(Sources.latestVersion(dir) === 3) // create, insert, merge
    val byTag = spark.sql("SELECT tag, COUNT(*) AS n FROM gm.t GROUP BY tag")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTag === Map("base" -> 90L, "merged" -> 10L, "inserted" -> 10L))
    assert(spark.sql("SELECT v FROM gm.t WHERE k = 95")
      .collect().head.getDouble(0) === 950.0)

    spark.sql("UPDATE gm.t SET tag = 'hot' WHERE k % 7 = 0")
    assert(spark.sql("SELECT COUNT(*) AS n FROM gm.t WHERE tag = 'hot'")
      .collect().head.getLong(0) === 16) // 0,7,...,105

    // modulo predicate is not source-filter-translatable: routes to the
    // row-level rewrite instead of erroring
    spark.sql("DELETE FROM gm.t WHERE k % 10 = 3")
    assert(spark.sql("SELECT COUNT(*) AS n FROM gm.t")
      .collect().head.getLong(0) === 99)

    // every rewrite is just another commit: pre-merge history pinned
    assert(spark.sql("SELECT COUNT(*) AS n FROM gm.t VERSION AS OF 2")
      .collect().head.getLong(0) === 100)
    // and no batch dir is stranded: all on-disk dirs referenced
    val referenced = (1 to Sources.latestVersion(dir))
      .flatMap(v => readManifest(dir, v))
      .map(f => java.nio.file.Paths.get(f).getParent.getFileName.toString)
      .toSet
    val onDisk = Option(new java.io.File(dir, "data").listFiles())
      .getOrElse(Array.empty).filter(_.isDirectory).map(_.getName).toSet
    assert((onDisk -- referenced).isEmpty,
      s"stranded batch dirs: ${onDisk -- referenced}")
    spark.sql("DROP TABLE gm.t")
  }

  test("DSv2 catalog: stats.columns tables self-maintain file skipping " +
    "across INSERT, DELETE, MERGE, and ALTER — no stats API in sight") {
    import graft.sources.Sources
    val wh = tmp("gauto")
    spark.conf.set("spark.sql.catalog.ga", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ga.warehouse", wh)
    spark.sql("""CREATE TABLE ga.t (k BIGINT, v DOUBLE)
                |TBLPROPERTIES ('stats.columns' = 'k')""".stripMargin)
    val dir = s"$wh/t"
    assert(Sources.tableProperties(dir) === Map("stats.columns" -> "k"))

    // range-clustered INSERT: the commit harvests the sidecar itself
    spark.range(0, 10000)
      .selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
      .repartitionByRange(8, col("k")).sortWithinPartitions("k")
      .createOrReplaceTempView("ga_src")
    spark.sql("INSERT INTO ga.t SELECT * FROM ga_src")
    assert(Sources.statsOf(dir, Sources.latestVersion(dir)).nonEmpty,
      "INSERT did not harvest the stats sidecar")
    def scanned(sql: String, expect: Long): Long = {
      val q = spark.sql(sql)
      assert(q.collect().head.getLong(0) === expect)
      scansOfV2(q)
    }
    val s1 = scanned("SELECT COUNT(*) AS n FROM ga.t WHERE k BETWEEN 100 AND 300", 201)
    assert(s1 < 8 && s1 >= 1, s"expected skipping after plain INSERT, scanned $s1/8")

    // a second append re-harvests incrementally (carried files' stats
    // copy forward; only the new batch is scanned)
    spark.sql("INSERT INTO ga.t SELECT id, 0.0 FROM range(20000, 20100)")
    val s2 = scanned("SELECT COUNT(*) AS n FROM ga.t WHERE k >= 20000", 100)
    assert(s2 < 9, s"appended-table skipping lost, scanned $s2")

    // file-granular DELETE keeps skipping alive (stats recommitted)
    spark.sql("DELETE FROM ga.t WHERE k < 1250")
    val s3 = scanned("SELECT COUNT(*) AS n FROM ga.t WHERE k BETWEEN 5000 AND 5100", 101)
    assert(s3 < 8, s"post-DELETE skipping lost, scanned $s3")

    // ALTER carries the sidecar verbatim (same files, same stats)
    spark.sql("ALTER TABLE ga.t ADD COLUMN tag STRING")
    assert(Sources.statsOf(dir, Sources.latestVersion(dir)).nonEmpty,
      "ALTER dropped the stats sidecar")

    // a row-level rewrite (UPDATE) recomputes stats over the new files
    spark.sql("UPDATE ga.t SET tag = 'x' WHERE k % 1000 = 0")
    assert(Sources.statsOf(dir, Sources.latestVersion(dir)).nonEmpty,
      "row-level rewrite dropped the stats sidecar")
    spark.sql("DROP TABLE ga.t")
  }

  test("declared layout: layout.range tables cluster every INSERT and " +
    "re-cluster on compaction; skipping works on UNSORTED producer data") {
    import graft.sources.Sources
    val wh = tmp("glayout")
    spark.conf.set("spark.sql.catalog.gl", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gl.warehouse", wh)
    spark.sql("""CREATE TABLE gl.t (k BIGINT, v DOUBLE)
                |TBLPROPERTIES ('stats.columns' = 'k',
                |               'layout.range' = 'k',
                |               'layout.files' = '8')""".stripMargin)
    val dir = s"$wh/t"
    // producer data arrives in RANDOM key order — the declared layout,
    // not the writer, is what makes the files skippable
    spark.range(0, 10000)
      .selectExpr("CAST(pmod(id * 2654435761, 10000) AS BIGINT) AS k",
        "CAST(id AS DOUBLE) AS v")
      .createOrReplaceTempView("gl_src")
    spark.sql("INSERT INTO gl.t SELECT * FROM gl_src")
    val q = spark.sql("SELECT COUNT(*) AS n FROM gl.t WHERE k BETWEEN 100 AND 300")
    val expect = q.collect().head.getLong(0)
    assert(expect > 0)
    val s1 = scansOfV2(q)
    assert(s1 < 8 && s1 >= 1,
      s"declared layout should make unsorted inserts skippable, scanned $s1/8")

    // a second unsorted insert: each batch clusters independently, so
    // the range query reads at most a couple of files per batch
    spark.sql("INSERT INTO gl.t SELECT k + 10000, v FROM gl_src")
    val q2 = spark.sql("SELECT COUNT(*) AS n FROM gl.t WHERE k BETWEEN 100 AND 300")
    assert(q2.collect().head.getLong(0) === expect)
    val s2 = scansOfV2(q2)
    assert(s2 <= s1 + 8 && s2 < 16, s"per-batch clustering lost, scanned $s2/16")

    // compaction honors the declared layout: global re-cluster, stats
    // recomputed by the catalog-independent API path
    val (cv, before, after) = Sources.compactVersion(spark, dir, 2500L)
    Sources.commitStats(spark, dir, cv, Seq("k"))
    assert(after < before)
    val q3 = spark.sql("SELECT COUNT(*) AS n FROM gl.t WHERE k BETWEEN 100 AND 300")
    assert(q3.collect().head.getLong(0) === expect)
    val s3 = scansOfV2(q3)
    assert(s3 <= 2, s"compaction should restore tight intervals, scanned $s3/$after")
    spark.sql("DROP TABLE gl.t")
  }

  test("metadata tables: g.`t$history` and g.`t$files` read version and " +
    "file inventories through pure SQL") {
    import graft.sources.Sources
    val wh = tmp("gmeta")
    spark.conf.set("spark.sql.catalog.gmt", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gmt.warehouse", wh)
    spark.sql("CREATE TABLE gmt.t (k BIGINT) TBLPROPERTIES ('stats.columns'='k')")
    spark.sql("INSERT INTO gmt.t SELECT id FROM range(0, 100)")
    spark.sql("INSERT INTO gmt.t SELECT id FROM range(100, 150)")
    val hist = spark.sql(
      "SELECT version, n_files, has_stats FROM gmt.`t$history` ORDER BY version")
      .collect()
    assert(hist.map(_.getInt(0)).toSeq === Seq(1, 2, 3))
    assert(hist.last.getBoolean(2), "latest version should carry stats")
    val files = spark.sql("SELECT * FROM gmt.`t$files`").collect()
    assert(files.length.toLong === hist.last.getLong(1))
    assert(files.forall(_.getBoolean(2)), "all files statted via stats.columns")
    // aggregates compose like any relation
    val totalBytes = spark.sql("SELECT SUM(bytes) AS b FROM gmt.`t$files`")
      .collect().head.getLong(0)
    assert(totalBytes > 0)
    // g.`t$dv`: the merge-on-read pressure gauge — empty while clean,
    // per-file marked-row counts after a DV delete, mirrored in $files
    assert(spark.sql("SELECT * FROM gmt.`t$dv`").collect().isEmpty)
    Sources.deleteWhereDv(spark, s"$wh/t",
      org.apache.spark.sql.functions.col("k") === 5)
    assert(spark.sql("SELECT SUM(dv_rows) FROM gmt.`t$dv`")
      .head().getLong(0) === 1L)
    assert(spark.sql("SELECT SUM(dv_rows) FROM gmt.`t$files`")
      .head().getLong(0) === 1L)
    // g.`t$partitions`: the skew/small-file gauge — an unpartitioned
    // table rolls up under one key; live rows come from the ndv
    // sidecar minus DV marks, never a scan
    val parts = spark.sql(
      "SELECT partition, n_files, live_rows, dv_rows FROM gmt.`t$partitions`")
      .collect()
    assert(parts.length === 1 && parts.head.getString(0) === "<unpartitioned>")
    assert(parts.head.getLong(1) === files.length.toLong)
    assert(parts.head.getLong(2) === 149L, // 150 rows - 1 DV-marked
      s"live_rows must be metadata-exact, got ${parts.head.getLong(2)}")
    assert(parts.head.getLong(3) === 1L)
    spark.sql("DROP TABLE gmt.t")
    // partitioned: one row per hive dir, per-partition file counts
    spark.sql("CREATE TABLE gmt.p (k BIGINT, g STRING) PARTITIONED BY (g)")
    spark.sql("INSERT INTO gmt.p SELECT id, CASE WHEN id % 2 = 0 " +
      "THEN 'a' ELSE 'b' END FROM range(0, 10)")
    val pparts = spark.sql(
      "SELECT partition, n_files FROM gmt.`p$partitions` ORDER BY partition")
      .collect()
    assert(pparts.map(_.getString(0)).toSeq === Seq("g=a", "g=b"))
    assert(pparts.forall(_.getLong(1) >= 1L))
    spark.sql("DROP TABLE gmt.p")
  }

  test("property: SQL DELETE == full-filter semantics for random " +
    "translatable predicates (stats pruning can never lose rows)") {
    import graft.sources.Sources
    val wh = tmp("gdelprop")
    spark.conf.set("spark.sql.catalog.gdp", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdp.warehouse", wh)
    val rnd = new scala.util.Random(42)
    // a deterministic grammar of translatable predicates over (k, g, s)
    def somePred(): String = {
      def leaf(): String = rnd.nextInt(6) match {
        case 0 => s"k = ${rnd.nextInt(2000)}"
        case 1 => s"k < ${rnd.nextInt(2000)}"
        case 2 => s"k >= ${rnd.nextInt(2000)}"
        case 3 => s"g = 'g${rnd.nextInt(5)}'"
        case 4 => s"k IN (${Seq.fill(3)(rnd.nextInt(2000)).mkString(", ")})"
        case 5 => s"s IS NULL"
      }
      rnd.nextInt(3) match {
        case 0 => leaf()
        case 1 => s"(${leaf()} AND ${leaf()})"
        case 2 => s"(${leaf()} OR ${leaf()})"
      }
    }
    for (trial <- 0 until 8) {
      val t = s"tp$trial"
      spark.sql(s"""CREATE TABLE gdp.$t (k BIGINT, g STRING, s STRING)
                   |TBLPROPERTIES ('stats.columns' = 'k,g',
                   |               'layout.range' = 'k')""".stripMargin)
      spark.sql(s"""INSERT INTO gdp.$t
                   |SELECT id AS k, concat('g', CAST(id % 5 AS STRING)) AS g,
                   |       CASE WHEN id % 7 = 0 THEN NULL
                   |            ELSE concat('s', CAST(id AS STRING)) END AS s
                   |FROM range(0, 2000)""".stripMargin)
      val pred = somePred()
      val expectKept = spark.sql(
        s"SELECT k FROM gdp.$t WHERE NOT coalesce($pred, false)")
        .collect().map(_.getLong(0)).toSet
      spark.sql(s"DELETE FROM gdp.$t WHERE $pred")
      val kept = spark.sql(s"SELECT k FROM gdp.$t")
        .collect().map(_.getLong(0)).toSet
      assert(kept === expectKept, s"trial $trial predicate [$pred]")
      spark.sql(s"DROP TABLE gdp.$t")
    }
  }

  test("concurrent catalog INSERTs both land through the OCC commit") {
    import graft.sources.Sources
    val wh = tmp("grace")
    spark.conf.set("spark.sql.catalog.grc", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.grc.warehouse", wh)
    spark.sql("CREATE TABLE grc.t (k BIGINT)")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    Await.result(Future.sequence((0 until 4).map { i =>
      Future {
        spark.sql(s"INSERT INTO grc.t SELECT id FROM range(${i * 1000}, ${i * 1000 + 1000})")
      }
    }), 120.seconds)
    assert(spark.sql("SELECT COUNT(*) AS n, COUNT(DISTINCT k) AS d FROM grc.t")
      .collect().head match { case r => r.getLong(0) == 4000 && r.getLong(1) == 4000 })
    assert(Sources.latestVersion(s"$wh/t") === 5) // create + 4 appends
    spark.sql("DROP TABLE grc.t")
  }

  test("DELETE across file generations keeps evolved-column values; " +
    "delete-all and truncate leave a readable, insertable empty table") {
    import graft.sources.Sources
    val wh = tmp("gmixed")
    spark.conf.set("spark.sql.catalog.gmx", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gmx.warehouse", wh)
    spark.sql("CREATE TABLE gmx.t (k BIGINT)")
    spark.sql("INSERT INTO gmx.t SELECT id FROM range(0, 100)")
    spark.sql("ALTER TABLE gmx.t ADD COLUMN tag STRING")
    spark.sql("INSERT INTO gmx.t SELECT id, 'new' FROM range(100, 200)")
    // the delete predicate hits BOTH generations' files: the survivor
    // rewrite must keep the new generation's tag values (pre-fix, the
    // rewrite could narrow to the old generation's footer schema)
    spark.sql("DELETE FROM gmx.t WHERE k >= 50 AND k < 150")
    val r = spark.sql(
      "SELECT COUNT(*) AS n, COUNT(tag) AS n_tag FROM gmx.t").collect().head
    assert(r.getLong(0) === 100 && r.getLong(1) === 50,
      s"expected 100 rows with 50 tagged, got ${r.getLong(0)}/${r.getLong(1)}")
    assert(spark.sql("SELECT COUNT(*) AS n FROM gmx.t WHERE tag = 'new'")
      .collect().head.getLong(0) === 50)

    // INSERT OVERWRITE (sidecar-less version) then delete EVERYTHING:
    // the empty version must still serve a schema
    spark.sql("INSERT OVERWRITE gmx.t SELECT id, 'ow' FROM range(0, 10)")
    spark.sql("DELETE FROM gmx.t WHERE k >= 0")
    assert(spark.sql("SELECT COUNT(*) AS n FROM gmx.t")
      .collect().head.getLong(0) === 0)
    spark.sql("INSERT INTO gmx.t SELECT 1, 'back'")
    assert(spark.sql("SELECT COUNT(*) AS n FROM gmx.t")
      .collect().head.getLong(0) === 1)

    // TRUNCATE TABLE: empty replacing commit, schema intact
    spark.sql("TRUNCATE TABLE gmx.t")
    assert(spark.sql("SELECT COUNT(*) AS n FROM gmx.t")
      .collect().head.getLong(0) === 0)
    spark.sql("INSERT INTO gmx.t SELECT 2, 'again'")
    assert(spark.sql("SELECT tag FROM gmx.t").collect().head.getString(0)
      === "again")
    // catalog RENAME over populated data is rejected, not silently null
    intercept[Exception] {
      spark.sql("ALTER TABLE gmx.t RENAME COLUMN tag TO label")
    }
    spark.sql("DROP TABLE gmx.t")
  }

  test("bloom.columns: point predicates on an UNCLUSTERED high-cardinality " +
    "column skip files min/max stats cannot") {
    import graft.sources.Sources
    val wh = tmp("gbloom")
    spark.conf.set("spark.sql.catalog.gb", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gb.warehouse", wh)
    spark.sql("""CREATE TABLE gb.t (id STRING, k BIGINT)
                |TBLPROPERTIES ('stats.columns' = 'k',
                |               'bloom.columns' = 'id,k')""".stripMargin)
    val dir = s"$wh/t"
    // ids hash-scrambled across 8 files: every file's [min,max] id/k
    // interval covers nearly the whole domain, so interval stats keep
    // ALL files for a point probe — the bloom is what skips
    spark.range(0, 8000)
      .selectExpr("concat('id-', CAST(pmod(id * 2654435761, 8000) AS STRING)) AS id",
        "CAST(pmod(id * 40503, 8000) AS BIGINT) AS k")
      .repartition(8)
      .createOrReplaceTempView("gb_src")
    spark.sql("INSERT INTO gb.t SELECT * FROM gb_src")
    assert(Sources.bloomsOf(dir, Sources.latestVersion(dir)).nonEmpty,
      "INSERT did not harvest the bloom sidecar")

    def scanned(sql: String, expect: Long): Long = {
      val q = spark.sql(sql)
      assert(q.collect().head.getLong(0) === expect)
      scansOfV2(q)
    }
    // string point probe
    val s1 = scanned("SELECT COUNT(*) AS n FROM gb.t WHERE id = 'id-4242'", 1)
    assert(s1 <= 3, s"bloom should skip most files for a string point, scanned $s1/8")
    // long point probe (k is also interval-statted, but unclustered)
    val s2 = scanned("SELECT COUNT(*) AS n FROM gb.t WHERE k = 1234", 1)
    assert(s2 <= 3, s"bloom should skip most files for a long point, scanned $s2/8")
    // IN probe: union of candidates, still bounded
    val s3 = scanned(
      "SELECT COUNT(*) AS n FROM gb.t WHERE id IN ('id-1', 'id-2', 'id-3')", 3)
    assert(s3 <= 6, s"bloom IN probe scanned $s3/8")
    // absent key: provably-empty scan, zero files
    val s4 = scanned("SELECT COUNT(*) AS n FROM gb.t WHERE id = 'id-99999'", 0)
    assert(s4 === 0, s"absent key should scan zero files, scanned $s4")
    // a long IN list (beyond the optimizer's In->InSet threshold) still
    // bloom-skips — the many-candidate lookup is the headline case
    val inList = (0 until 12).map(i => s"'id-$i'").mkString(", ")
    val s5 = scanned(s"SELECT COUNT(*) AS n FROM gb.t WHERE id IN ($inList)", 12)
    assert(s5 < 8, s"InSet probe should still skip, scanned $s5/8")
    // a second INSERT carries blooms incrementally and stays exact
    spark.sql("INSERT INTO gb.t SELECT concat('x-', CAST(id AS STRING)), id FROM range(0, 100)")
    assert(spark.sql("SELECT COUNT(*) AS n FROM gb.t WHERE id = 'x-7'")
      .collect().head.getLong(0) === 1)
    // bloom sidecar survives a file-granular DELETE and keeps skipping
    spark.sql("DELETE FROM gb.t WHERE k = 1234")
    assert(Sources.bloomsOf(dir, Sources.latestVersion(dir)).nonEmpty,
      "DELETE dropped the bloom sidecar")
    assert(spark.sql("SELECT COUNT(*) AS n FROM gb.t WHERE id = 'x-7'")
      .collect().head.getLong(0) === 1)
    spark.sql("DROP TABLE gb.t")
  }

  test("DSv2 catalog namespaces: CREATE NAMESPACE, nested tables, SHOW") {
    val wh = tmp("gns")
    spark.conf.set("spark.sql.catalog.gn", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gn.warehouse", wh)
    spark.sql("CREATE NAMESPACE gn.raw")
    spark.sql("CREATE TABLE gn.raw.docs (id BIGINT)")
    spark.sql("INSERT INTO gn.raw.docs SELECT id FROM range(0, 5)")
    assert(spark.sql("SELECT COUNT(*) AS n FROM gn.raw.docs")
      .collect().head.getLong(0) === 5)
    val shown = spark.sql("SHOW TABLES IN gn.raw")
      .collect().map(_.getString(1))
    assert(shown.contains("docs"))
    val ns = spark.sql("SHOW NAMESPACES IN gn")
      .collect().map(_.getString(0))
    assert(ns.contains("raw"))
    // non-cascade drop refuses a non-empty namespace
    intercept[Exception] { spark.sql("DROP NAMESPACE gn.raw") }
    spark.sql("DROP NAMESPACE gn.raw CASCADE")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$wh/raw")))
  }

  /** numFiles summed over v2 BatchScans (and any v1 scans) in the
    * AQE-final plan. */
  private def scansOfV2(df: org.apache.spark.sql.DataFrame): Long = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def go(p: SparkPlan): Seq[SparkPlan] =
      p +: (p match {
        case a: AdaptiveSparkPlanExec => go(a.executedPlan)
        case s: QueryStageExec => go(s.plan)
        case o => o.children.flatMap(go)
      })
    go(df.queryExecution.executedPlan).collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan match {
          case f: org.apache.spark.sql.execution.datasources.v2.FileScan =>
            f.fileIndex.listFiles(f.partitionFilters, f.dataFilters)
              .map(_.files.length.toLong).sum
          case _ => 0L
        }
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numFiles").value
    }.sum
  }

  test("conflict-losing merge deletes its batch: no unreferenced data dirs") {
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_orderpriority")
    val t = tmp("vrace") + "/orders_r"
    val v1 = Sources.commitVersion(
      orders.repartitionByRange(4, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey"), t)
    Sources.commitStats(spark, t, v1, Seq("o_orderkey"))
    import spark.implicits._
    def changesFor(tag: String) = Seq(
      (1L, 1L, tag, "upsert")).toDF("o_orderkey", "o_custkey",
      "o_orderpriority", "op")
    // two merges based on the same version race; exactly one wins
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val results = Await.result(
      Future.sequence(Seq("A", "B").map { tag =>
        Future(
          try Right(Sources.mergeVersion(spark, t, changesFor(tag), "o_orderkey"))
          catch { case e: java.util.ConcurrentModificationException => Left(e) })
      }), 120.seconds)
    assert(results.count(_.isRight) === 1 && results.count(_.isLeft) === 1,
      s"expected exactly one winner, got $results")
    // every batch dir on disk is referenced by some surviving manifest
    val referenced = (1 to Sources.latestVersion(t))
      .flatMap(v => readManifest(t, v))
      .map(f => java.nio.file.Paths.get(f).getParent.getFileName.toString)
      .toSet
    val onDisk = Option(new java.io.File(t, "data").listFiles())
      .getOrElse(Array.empty).filter(_.isDirectory).map(_.getName).toSet
    assert((onDisk -- referenced).isEmpty,
      s"stranded batch dirs: ${onDisk -- referenced}")
  }

  private def readManifest(table: String, v: Int): Seq[String] = {
    val p = java.nio.file.Paths.get(table, s"v$v.manifest")
    if (!java.nio.file.Files.exists(p)) Nil
    else scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(p)).asScala.toSeq
        .filter(l => l.nonEmpty && !l.startsWith("#"))
  }

  test("write surface: df.write.format(graft) commits versions with stats; " +
    "modes honor manifest history") {
    import spark.implicits._
    val t = tmp("gwrite") + "/t"
    val d1 = (1L to 100L).toDF("k").withColumn("v", col("k") * 2)
    // ErrorIfExists on a fresh table commits v1
    d1.repartitionByRange(4, col("k")).sortWithinPartitions("k")
      .write.format("graft").mode(SaveMode.ErrorIfExists)
      .option("statsColumns", "k").save(t)
    assert(Sources.latestVersion(t) === 1)
    // ...and refuses a second time
    intercept[Exception] {
      d1.write.format("graft").mode(SaveMode.ErrorIfExists).save(t)
    }
    // Ignore is a no-op on an existing table
    d1.write.format("graft").mode(SaveMode.Ignore).save(t)
    assert(Sources.latestVersion(t) === 1)
    // Append carries v1's files; Overwrite replaces
    (101L to 120L).toDF("k").withColumn("v", col("k") * 2)
      .write.format("graft").mode(SaveMode.Append).save(t)
    assert(Sources.latestVersion(t) === 2)
    assert(spark.read.format("graft").load(t).count() === 120)
    assert(spark.read.format("graft").option("versionAsOf", 1)
      .load(t).count() === 100)
    d1.limit(7).write.format("graft").mode(SaveMode.Overwrite).save(t)
    assert(spark.read.format("graft").load(t).count() === 7)
    assert(spark.read.format("graft").option("versionAsOf", 2)
      .load(t).count() === 120)
    // the statsColumns option produced a skipping sidecar for v1
    val (kept, skipped) = Sources.pruneFiles(t, 1, "k",
      BigDecimal(1), BigDecimal(10))
    assert(skipped.nonEmpty && kept.nonEmpty,
      s"expected write-side stats to enable skipping, kept=${kept.size}")
  }

  test("rejected checked commit leaves no batch directory behind") {
    import spark.implicits._
    val t = tmp("vreject") + "/t"
    Sources.commitVersion(Seq((1L, 5L)).toDF("k", "v"), t)
    val bad = Seq((2L, -1L)).toDF("k", "v")
    val res = Sources.commitVersionChecked(bad, t,
      checks = Seq("v_nonneg" -> (col("v") >= 0)))
    assert(res.isLeft)
    val dataDirs = Option(new java.io.File(t, "data").listFiles())
      .getOrElse(Array.empty).filter(_.isDirectory)
    // only v1's batch remains — the rejected batch tree is fully gone
    assert(dataDirs.length === 1,
      s"expected 1 surviving batch dir, got ${dataDirs.map(_.getName).toSeq}")
  }

  test("scoped compaction (OPTIMIZE ... WHERE): only the hot partition's " +
    "files rewrite, the cold partition carries byte-identical, DV marks " +
    "in scope absorb, and the SQL procedure drives it") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("opt-scope").toString
    spark.conf.set("spark.sql.catalog.optcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.optcat.warehouse", wh)
    spark.sql("CREATE TABLE optcat.t (k BIGINT, v BIGINT, p STRING) " +
      "PARTITIONED BY (p)")
    // five tiny commits per partition — the micro-batch fragmentation
    // scoped compaction exists to repair
    (1 to 5).foreach { i =>
      Seq((i.toLong, i.toLong, "hot"), (100L + i, i.toLong, "cold"))
        .toDF("k", "v", "p").createOrReplaceTempView("opt_batch")
      spark.sql("INSERT INTO optcat.t SELECT * FROM opt_batch")
    }
    val t = s"$wh/t"
    // a DV point delete inside the scope: the rewrite must absorb it
    Sources.deleteWhereDv(spark, t, col("k") === 3L)
    val v0 = Sources.latestVersion(t)
    val before = spark.sql("SELECT * FROM optcat.t ORDER BY k").collect()
    def manifest(v: Int): Seq[String] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(t, s"v$v.manifest")).asScala.toSeq
        .filter(l => l.nonEmpty && !l.startsWith("#"))
    }
    val coldBefore = manifest(v0).filter(_.contains("p=cold")).sorted
    val hotBefore = manifest(v0).count(_.contains("p=hot"))
    assert(hotBefore === 5)
    val res = spark.sql(
      "CALL optcat.system.optimize('t', 1000000, 'p=hot')").collect().head
    val vNew = res.getInt(0)
    assert(res.getInt(1) === 5, "all five hot files were in scope")
    assert(res.getInt(2) === 1, "the hot partition compacts to one file")
    assert(manifest(vNew).filter(_.contains("p=cold")).sorted === coldBefore,
      "cold-partition files must carry byte-identical")
    assert(Sources.dvOf(t, vNew).isEmpty,
      "the in-scope DV mark is absorbed by the rewrite")
    val after = spark.sql("SELECT * FROM optcat.t ORDER BY k").collect()
    assert(after.toSeq === before.toSeq,
      "scoped compaction must not change the state")
    // small-file targeting: the freshly compacted (larger) hot file is
    // NOT in scope of a tiny-threshold pass; the cold partition's five
    // fragments are — exactly the micro-batch repair semantics
    val res2 = spark.sql(
      "CALL optcat.system.optimize('t', 1000000, '', 2048)").collect().head
    assert(res2.getInt(1) >= 5,
      s"the cold fragments must be in the small-file scope, got $res2")
    val after2 = spark.sql("SELECT * FROM optcat.t ORDER BY k").collect()
    assert(after2.toSeq === before.toSeq,
      "small-file compaction must not change the state")
    spark.sql("DROP TABLE optcat.t")
  }
}
