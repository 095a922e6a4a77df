package graft

import graft.sources.Sources
import org.apache.spark.sql.functions._

class SourcesSpec extends SparkTestBase {

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit(); d.toString
  }

  test("csv round-trip preserves values under an explicit schema") {
    val src = Tables.part(spark, sf)
    val path = tmp("csv-rt")
    Sources.writeCsv(src, path)
    val back = Sources.readCsv(spark, path, src.schema)
    assert(back.count() === src.count())
    assert(back.exceptAll(src).count() === 0)
    assert(src.exceptAll(back).count() === 0)
  }

  test("json-lines round-trip preserves values under an explicit schema") {
    val src = Tables.customer(spark, sf)
    val path = tmp("json-rt")
    Sources.writeJsonLines(src, path)
    val back = Sources.readJsonLines(spark, path, src.schema)
    assert(back.count() === src.count())
    assert(back.exceptAll(src).count() === 0)
  }

  test("partitioned parquet write prunes partitions on read") {
    val src = Tables.orders(spark, sf)
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
    val path = tmp("pq-part")
    Sources.writeParquet(src, path, partitionBy = Seq("o_month"))
    val months = src.select("o_month").distinct().count()
    assert(new java.io.File(path).listFiles()
      .count(_.getName.startsWith("o_month=")) === months)
    val one = src.select("o_month").distinct().orderBy("o_month").head().getString(0)
    val pruned = spark.read.parquet(path).filter(col("o_month") === one)
    // partition filter must reach the scan (PartitionFilters, not data filter)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_month"), plan)
  }

  test("schema evolution: mergeSchema unions columns across file generations") {
    val path = tmp("pq-evolve")
    val v1 = Tables.part(spark, sf).select("p_partkey", "p_name")
    val v2 = Tables.part(spark, sf).select("p_partkey", "p_name", "p_retailprice")
    v1.write.parquet(s"$path/gen=1")
    v2.write.parquet(s"$path/gen=2")
    val merged = Sources.readParquetEvolving(spark, path)
    assert(merged.columns.toSet === Set("p_partkey", "p_name", "p_retailprice", "gen"))
    // old-generation rows surface the new column as null
    assert(merged.filter(col("gen") === 1 && col("p_retailprice").isNotNull).count() === 0)
    assert(merged.filter(col("gen") === 2 && col("p_retailprice").isNull).count() === 0)
    assert(merged.count() === 2 * v1.count())
  }

  test("schema evolution: rename mapping + int->long widening into the current schema") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val path = tmp("pq-evolve2")
    // gen1: old name `qty` stored as INT; gen2: renamed to `quantity`, LONG
    Seq((1, 10), (2, 20)).toDF("id", "qty")
      .write.parquet(s"$path/gen=1")
    Seq((3L, 30L), (4L, 40L)).toDF("id", "quantity")
      .write.parquet(s"$path/gen=2")
    val target = StructType(Seq(
      StructField("id", LongType), StructField("quantity", LongType)))
    val got = Sources.readParquetEvolved(spark,
      Seq(s"$path/gen=1", s"$path/gen=2"), target,
      renames = Map("qty" -> "quantity"))
    assert(got.schema.fields.map(f => f.name -> f.dataType).toSeq ===
      Seq("id" -> LongType, "quantity" -> LongType))
    val byId = got.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId === Map(1L -> 10L, 2L -> 20L, 3L -> 30L, 4L -> 40L))
  }

  test("schema evolution: narrowing cast fails fast instead of truncating") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val path = tmp("pq-narrow")
    Seq((1L, 10L)).toDF("id", "v").write.parquet(s"$path/g1")
    val target = StructType(Seq(
      StructField("id", LongType), StructField("v", IntegerType)))
    val e = intercept[IllegalArgumentException] {
      Sources.readParquetEvolved(spark, Seq(s"$path/g1"), target)
    }
    assert(e.getMessage.contains("widen"))
  }

  test("bucketed layout: fact-orders join plans with zero shuffle exchanges") {
    graft.sources.Warehouse.buildBucketed(spark, sf)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the join would otherwise need a full shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = graft.sources.Warehouse.bucketedJoin(spark)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(plan.contains("SortMergeJoin"), plan)
      // bucket pruning metadata present on both scans
      assert(plan.contains("Bucketed: true"), plan)
      // and the join still produces the right multiplicity
      assert(joined.count() === Tables.lineitem(spark, sf).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
