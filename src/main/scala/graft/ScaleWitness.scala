package graft

import org.apache.spark.sql.SparkSession

/** The SCALE witness: run the pinned 20-query bench slice plus the
  * end-to-end pipeline gate (q230) against an arbitrary SF directory —
  * built for the ScaleUp-generated sf1 fixture, where running the full
  * 250-entry inventory (lifecycle gates included) would measure
  * harness cost, not engine scaling. Prints one BENCH-shaped JSON line
  * with the build/read split per query so the read path's scaling
  * factor vs the sf0.1 record is directly comparable.
  *
  * Usage: runMain graft.ScaleWitness [sfDir]
  */
object ScaleWitness {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft-sf1")
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
    Tables.lineitem(spark, sfDir).groupBy("l_returnflag").count()
      .write.mode("overwrite").format("noop").save()

    // the Bench pinned slice + the end-to-end pipeline compose gate
    val names = Seq(
      "q01_scan_project", "q03_hyperjoin", "q04_star_join",
      "q11_groupby_agg", "q13a_rollup", "q24_cosine_topk",
      "q28_dedup_minhash", "q31b_knn_lsh", "q66_dedup_clusters",
      "q80_quality_verdict", "q98_semdedup", "q125_bm25",
      "q137_setsim_prefix", "q149_weighted_sample", "q180_basket_triples",
      "q203_ivfadc", "q212_bucketed_spj", "q219_transform_partition",
      "q224_d4_diversify", "q227_semdedup_bounded", "q230_pipeline_e2e",
      // round-10 additions: the gram-join, codec, and regex passes
      "q238_decontaminate", "q241_image_resize", "q242_pii_scrub",
      // round-10 continuation: normalization (map-only), projection
      // (map-only), the incremental dedup store and chunked backfill
      // (lifecycle builds — streaming drains + ledgered merges at sf1)
      "q239_nfc_normalize", "q240_random_projection", "q245_dedup_store",
      "q246_backfill",
      // round-10 third block: the full incremental dedup chain
      // (LSH index -> components -> verdicts) under the mutation
      // lifecycle — the three-maintainer build at 10x
      "q253_verdict_view")
    val byName = SparkEntry.inventory.map(q => q.name -> q).toMap
    val results = names.flatMap(n => byName.get(n)).map { q =>
      val t0 = System.nanoTime()
      try {
        val df = q.build(spark, sfDir)
        val t1 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        val t2 = System.nanoTime()
        q.name -> ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
      } catch { case e: Throwable =>
        System.err.println(s"[witness] ${q.name} failed: ${e.getMessage}")
        q.name -> (-1.0, -1.0)
      }
    }
    val qs = results.map { case (k, (b, r)) =>
      "\"" + k + "\":" + (if (b < 0) "-1"
        else f"""{"build":$b%.2f,"read":$r%.2f}""")
    }.mkString("{", ",", "}")
    val reads = results.collect { case (_, (b, r)) if b >= 0 => r }.sorted
    val readTotal = reads.sum
    val readP50 = if (reads.isEmpty) 0.0 else reads(reads.size / 2)
    val failed = results.count(_._2._1 < 0)
    val line =
      f"""{"metric":"scale_witness","read_total":$readTotal%.2f,"read_p50":$readP50%.2f,"n":${results.size},"failed":$failed,"queries":$qs,"sf":"$sfDir"}"""
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("SCALE_WITNESS.json").toAbsolutePath,
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Exception =>
      System.err.println(s"[witness] write failed: ${e.getMessage}") }
    println(line)
    spark.stop()
  }
}
