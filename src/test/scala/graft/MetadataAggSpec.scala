package graft

import graft.sources.Sources
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[graft.sources.MetadataOnlyAggregates]]: COUNT(*)/MIN/MAX answered
  * from manifest sidecars with zero files opened — and, just as
  * important, every case where it must REFUSE: DVs under extrema,
  * pending equality deletes, consumed partition filters, missing
  * sidecar coverage, non-ASCII string bounds. */
class MetadataAggSpec extends SparkTestBase {

  graft.plans.GraftRules.install(spark)

  private def freshCatalog(): String = {
    val wh = java.nio.file.Files.createTempDirectory("mago-cat")
    wh.toFile.deleteOnExit()
    val cat = s"ma${math.abs(wh.toString.hashCode)}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    cat
  }

  /** Optimized plan degenerated to a LocalRelation, no table relation
    * left anywhere — the zero-files-read witness. */
  private def metadataOnly(df: DataFrame): Boolean = {
    val opt = df.queryExecution.optimizedPlan
    val local = opt.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }.nonEmpty
    val scans = opt.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation => r
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
    }.nonEmpty
    local && !scans
  }

  private def mkOrders(cat: String, name: String,
      props: String = "TBLPROPERTIES ('stats.columns' = " +
        "'o_orderkey,o_totalprice,o_orderpriority')"): Unit = {
    Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
      .createOrReplaceTempView("mago_spec_src")
    spark.sql(s"""CREATE TABLE $cat.$name (
                 |  o_orderkey BIGINT, o_totalprice DOUBLE,
                 |  o_orderpriority STRING)
                 |$props""".stripMargin)
    spark.sql(s"INSERT INTO $cat.$name SELECT * FROM mago_spec_src")
  }

  test("clean table: count/min/max answered as a LocalRelation, values " +
    "exactly the scan's") {
    val cat = freshCatalog()
    mkOrders(cat, "t1")
    val df = spark.sql(
      s"""SELECT count(*) AS n, min(o_orderkey) AS mnk,
         |  max(o_orderkey) AS mxk, min(o_orderpriority) AS mnp,
         |  max(o_orderpriority) AS mxp, max(o_totalprice) AS mxp2,
         |  min(o_totalprice) AS mnp2
         |FROM $cat.t1""".stripMargin)
    assert(metadataOnly(df), df.queryExecution.optimizedPlan.toString)
    val got = df.head()
    val exp = Tables.orders(spark, sf)
      .agg(count(lit(1)), min("o_orderkey"), max("o_orderkey"),
        min("o_orderpriority"), max("o_orderpriority"),
        max("o_totalprice"), min("o_totalprice")).head()
    assert(got == exp)
  }

  test("after a DV delete: COUNT(*) stays metadata-only and exact; " +
    "MIN refuses the metadata answer and scans to the right value") {
    val cat = freshCatalog()
    mkOrders(cat, "t2")
    spark.sql(s"DELETE FROM $cat.t2 WHERE o_orderkey % 7 = 3")
    val cnt = spark.sql(s"SELECT count(*) AS n FROM $cat.t2")
    assert(metadataOnly(cnt), "count must stay metadata-only under DVs")
    val mn = spark.sql(s"SELECT min(o_orderkey) AS mn FROM $cat.t2")
    assert(!metadataOnly(mn), "min must scan once DVs exist")
    val exp = Tables.orders(spark, sf)
      .filter(not(pmod(col("o_orderkey"), lit(7)) === 3))
      .agg(count(lit(1)).cast("long"), min("o_orderkey")).head()
    assert(cnt.head().getLong(0) == exp.getLong(0))
    assert(mn.head().getLong(0) == exp.getLong(1))
  }

  test("a filter above the relation disables the rewrite (and the " +
    "scan answer is right)") {
    val cat = freshCatalog()
    mkOrders(cat, "t3")
    val df = spark.sql(
      s"SELECT count(*) AS n FROM $cat.t3 WHERE o_totalprice > 1000.0")
    assert(!metadataOnly(df))
    val exp = Tables.orders(spark, sf)
      .filter(col("o_totalprice") > 1000.0).count()
    assert(df.head().getLong(0) == exp)
  }

  test("identity partition predicate CONSUMED by pushdown still " +
    "disables the rewrite — the partitionFilters guard") {
    val cat = freshCatalog()
    Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderpriority").as("prio"))
      .createOrReplaceTempView("mago_part_src")
    spark.sql(s"""CREATE TABLE $cat.tp (
                 |  o_orderkey BIGINT, o_totalprice DOUBLE, prio STRING)
                 |TBLPROPERTIES ('partition.columns' = 'prio',
                 |  'stats.columns' = 'o_orderkey')""".stripMargin)
    spark.sql(s"INSERT INTO $cat.tp SELECT * FROM mago_part_src")
    val df = spark.sql(
      s"SELECT count(*) AS n FROM $cat.tp WHERE prio = '1-URGENT'")
    assert(!metadataOnly(df),
      "a consumed partition filter must keep the scan: " +
        df.queryExecution.optimizedPlan.toString)
    val exp = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT").count()
    assert(df.head().getLong(0) == exp)
    // and the unfiltered count on the same partitioned table IS
    // metadata-only
    val full = spark.sql(s"SELECT count(*) AS n FROM $cat.tp")
    assert(metadataOnly(full))
    assert(full.head().getLong(0) == Tables.orders(spark, sf).count())
  }

  test("pending equality deletes disable every metadata answer") {
    val cat = freshCatalog()
    mkOrders(cat, "t4")
    val table = spark.conf.get(s"spark.sql.catalog.$cat.warehouse") +
      "/t4"
    import spark.implicits._
    val changes = Seq((1L, 0.0, "X", "delete"))
      .toDF("o_orderkey", "o_totalprice", "o_orderpriority", "op")
    Sources.mergeVersionEq(spark, table, changes, Seq("o_orderkey"))
    val cnt = spark.sql(s"SELECT count(*) AS n FROM $cat.t4")
    assert(!metadataOnly(cnt),
      "eq-pending count is unknowable from metadata")
    val expected = Tables.orders(spark, sf)
      .filter(col("o_orderkey") =!= 1L).count()
    assert(cnt.head().getLong(0) == expected)
  }

  test("composite aggregate expressions and GROUP BY are untouched") {
    val cat = freshCatalog()
    mkOrders(cat, "t5")
    val comp = spark.sql(
      s"SELECT count(*) + 1 AS n1 FROM $cat.t5")
    assert(!metadataOnly(comp))
    assert(comp.head().getLong(0) ==
      Tables.orders(spark, sf).count() + 1)
    val grp = spark.sql(
      s"SELECT o_orderpriority, count(*) FROM $cat.t5 GROUP BY 1")
    assert(!metadataOnly(grp))
    assert(grp.count() == Tables.orders(spark, sf)
      .select("o_orderpriority").distinct().count())
  }

  test("a table without declared stats columns has no sidecar " +
    "coverage: everything falls back to the scan") {
    val cat = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t6 (k BIGINT, v STRING)")
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .createOrReplaceTempView("mago_nostats_src")
    spark.sql(s"INSERT INTO $cat.t6 SELECT * FROM mago_nostats_src")
    val df = spark.sql(s"SELECT count(*) AS n, min(k) AS mn FROM $cat.t6")
    if (!metadataOnly(df)) () // expected when no ndv sidecar exists
    else assert(df.head() == org.apache.spark.sql.Row(2L, 1L))
    assert(df.head().getLong(0) == 2L && df.head().getLong(1) == 1L)
  }

  test("non-ASCII string bounds are not persisted: MIN(string) falls " +
    "back while COUNT stays metadata-only") {
    val cat = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.t7 (k BIGINT, s STRING)
                 |TBLPROPERTIES ('stats.columns' = 'k,s')""".stripMargin)
    import spark.implicits._
    Seq((1L, "zürich"), (2L, "aachen")).toDF("k", "s")
      .createOrReplaceTempView("mago_uni_src")
    spark.sql(s"INSERT INTO $cat.t7 SELECT * FROM mago_uni_src")
    val cnt = spark.sql(s"SELECT count(*) AS n FROM $cat.t7")
    assert(metadataOnly(cnt))
    assert(cnt.head().getLong(0) == 2L)
    val mn = spark.sql(s"SELECT min(s) AS mn FROM $cat.t7")
    assert(!metadataOnly(mn),
      "non-ASCII bounds are unpersisted; min must scan")
    assert(mn.head().getString(0) == "aachen")
    // the numeric column on the same files IS covered
    val mk = spark.sql(s"SELECT max(k) AS mx FROM $cat.t7")
    assert(metadataOnly(mk))
    assert(mk.head().getLong(0) == 2L)
  }

  test("DataFrame-API count()/agg over the catalog table rewrites too") {
    val cat = freshCatalog()
    mkOrders(cat, "t8")
    val df = spark.table(s"$cat.t8")
      .agg(count(lit(1)).as("n"), max(col("o_orderkey")).as("mx"))
    assert(metadataOnly(df), df.queryExecution.optimizedPlan.toString)
    val exp = Tables.orders(spark, sf)
      .agg(count(lit(1)), max("o_orderkey")).head()
    assert(df.head() == exp)
  }
}
