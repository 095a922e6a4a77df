package graft

import org.apache.spark.sql.SparkSession
import graft.streaming.StreamingPipeline

/** Runnable streaming demo: replays the events fixture through the
  * micro-batch ETL (watermarked window agg + foreachBatch keyed upsert)
  * and prints what landed — the E1 pipeline of SURVEY.md §3, end to end.
  *
  * Usage: runMain graft.StreamSmoke [sfDir] [outDir]
  */
object StreamSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("stream-smoke").toString)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // large heaps inflate the default page size to 64m; hash-aggregate
      // tasks then spend their time zeroing pages (measured 148s->12s on
      // the minhash pipeline at sf0.1)
      .config("spark.buffer.pageSize", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val q = StreamingPipeline.dimUpsertQuery(spark, sfDir, outDir)
    q.awaitTermination(120000)

    val dim = spark.read.parquet(s"$outDir/dim_user")
    println(s"[stream-smoke] dim_user rows: ${dim.count()}")
    dim.orderBy("user_id").show(5, truncate = false)

    val counts = StreamingPipeline.windowedCounts(
        StreamingPipeline.readEvents(spark, sfDir))
      .writeStream.outputMode("append").format("memory").queryName("wc")
      .option("checkpointLocation", s"$outDir/_ckpt_wc")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    counts.awaitTermination(120000)
    val wc = spark.table("wc")
    println(s"[stream-smoke] closed windows emitted: ${wc.count()}")
    wc.orderBy("window").show(5, truncate = false)
    spark.stop()
  }
}
