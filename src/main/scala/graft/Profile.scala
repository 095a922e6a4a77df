package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiler: run named inventory queries (or all) against a SF
  * dir, print per-query seconds; `-x` additionally dumps the formatted
  * physical plan — the `.explain` loop SURVEY.md §7 mandates after each
  * operator lands.
  *
  * Usage: runMain graft.Profile <sfDir> [-x] [name...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val explain = args.contains("-x")
    val names = args.drop(1).filterNot(_ == "-x")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // large heaps inflate the default page size to 64m; hash-aggregate
      // tasks then spend their time zeroing pages (measured 148s->12s on
      // the minhash pipeline at sf0.1)
      .config("spark.buffer.pageSize", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // same warm-up as Bench: touch parquet reader, codegen and shuffle
    // once so the first profiled query isn't charged for JVM warm-up
    Tables.lineitem(spark, sfDir).groupBy("l_returnflag").count()
      .write.mode("overwrite").format("noop").save()

    val picked =
      if (names.isEmpty) SparkEntry.inventory
      else SparkEntry.inventory.filter(q => names.exists(q.name.contains))
    picked.foreach { q =>
      val tb = System.nanoTime()
      val df = q.build(spark, sfDir)
      val build = (System.nanoTime() - tb) / 1e9
      if (explain) {
        println(s"===== ${q.name} =====")
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val read = (System.nanoTime() - t0) / 1e9
      println(f"[profile] ${q.name}%-28s build $build%8.2f s  read $read%8.2f s")
    }
    spark.stop()
  }
}
