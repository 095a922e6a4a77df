package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Job-grain profiler (guide §1: measure first): runs named inventory
  * queries with a listener that attributes every Spark job to its
  * call site, then prints a per-site time/count rollup. This is how
  * the fixed per-commit overhead of the lifecycle gates was located —
  * `Profile` times a query as one number; this answers WHERE inside
  * build() the time goes.
  *
  * Usage: runMain graft.ProfileJobs <sfDir> <name> [name...]
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.buffer.pageSize", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val agg = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
    val log = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val p = Option(js.properties)
        // prefer the explicit description (setJobDescription) — the
        // maintainers label their phases; fall back to the call site
        val site = p.flatMap(x =>
            Option(x.getProperty("spark.job.description")))
          .orElse(p.flatMap(x => Option(x.getProperty("callSite.short"))))
          .getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, site) =>
          val ms = (System.nanoTime() - t0) / 1000000
          log.add(f"  job ${je.jobId}%4d ${ms}%6d ms  $site")
          agg.merge(site, (ms, 1L),
            (a, b) => (a._1 + b._1, a._2 + b._2))
        }
      }
    })

    // same warm-up as Bench
    Tables.lineitem(spark, sfDir).groupBy("l_returnflag").count()
      .write.mode("overwrite").format("noop").save()
    Thread.sleep(300); agg.clear(); log.clear()

    val picked = SparkEntry.inventory.filter(q => names.exists(q.name.contains))
    picked.foreach { q =>
      println(s"===== ${q.name} =====")
      val tb = System.nanoTime()
      val df = q.build(spark, sfDir)
      val build = (System.nanoTime() - tb) / 1e9
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val read = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(s"-- job sequence --")
      log.forEach(l => println(l))
      println(s"-- per-call-site rollup --")
      val rows = scala.jdk.CollectionConverters.MapHasAsScala(agg).asScala
        .toSeq.sortBy(-_._2._1)
      rows.foreach { case (site, (ms, n)) =>
        println(f"  ${ms}%7d ms  ${n}%4d jobs  $site")
      }
      println(f"[profile-jobs] ${q.name}%-28s build $build%8.2f s  read $read%8.2f s  jobs ${rows.map(_._2._2).sum}")
      agg.clear(); log.clear()
    }
    spark.stop()
  }
}
