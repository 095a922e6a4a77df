package graft

import graft.functions.{MultimodalOps, SimilarityOps, TextOps}
import graft.operators.DedupOps
import org.apache.spark.sql.functions._

class TextDedupSpec extends SparkTestBase {

  test("q23 top words: at most 20 per lang, counts descending") {
    val df = TextOps.q23.build(spark, sf).cache()
    assert(df.groupBy("lang").count().agg(max("count")).head().getLong(0) <= 20)
    val bad = df.withColumn("prev",
        lag("cnt", 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy("lang").orderBy("rn")))
      .filter(col("prev").isNotNull && col("cnt") > col("prev"))
    assert(bad.count() === 0)
  }

  test("q27 exact dedup: group count sums to doc count") {
    val df = DedupOps.q27.build(spark, sf)
    assert(df.agg(sum("n_copies")).head().getLong(0) ===
      Tables.documents(spark, sf).count())
  }

  test("q28 minhash: estimated jaccard in [0,1], pairs ordered") {
    val df = DedupOps.q28.build(spark, sf).cache()
    assert(df.filter(col("est_jaccard") < 0 || col("est_jaccard") > 1).count() === 0)
    assert(df.filter(col("a_doc") >= col("b_doc")).count() === 0)
  }

  test("q29 simhash: hamming <= 6 and pairs ordered") {
    val df = DedupOps.q29.build(spark, sf).cache()
    assert(df.filter(col("hamming") > 6).count() === 0)
    assert(df.filter(col("a_doc") >= col("b_doc")).count() === 0)
  }

  test("q30 ngram jaccard: values in [0.2, 1]") {
    val df = DedupOps.q30.build(spark, sf)
    assert(df.filter(col("jaccard") < 0.2 || col("jaccard") > 1).count() === 0)
  }

  test("q24 cosine: similarity within [-1, 1], 5 per label") {
    val df = SimilarityOps.q24.build(spark, sf).cache()
    assert(df.filter(abs(col("sim")) > 1.0000001).count() === 0)
    assert(df.groupBy("label").count().agg(max("count")).head().getLong(0) <= 5)
  }

  test("q31 brute-force knn: one neighbor per probe, not self") {
    val df = SimilarityOps.q31.build(spark, sf).cache()
    assert(df.count() === df.select("a_id").distinct().count())
    assert(df.filter(col("a_id") === col("b_id")).count() === 0)
  }

  test("q31b LSH ANN: candidates are a subset — sim never beats brute force") {
    val bf = SimilarityOps.q31.build(spark, sf)
      .select(col("a_id"), col("sim").as("bf_sim"))
    val lsh = SimilarityOps.q31b.build(spark, sf)
      .select(col("a_id"), col("sim").as("lsh_sim"))
    val worse = bf.join(lsh, "a_id")
      .filter(col("lsh_sim") > col("bf_sim") + 1e-9)
    assert(worse.count() === 0)
  }

  test("q31b LSH ANN: recall@1 >= 0.8 vs brute force") {
    // the number every real ANN deployment tracks: how often the
    // approximate index returns the true nearest neighbor. A probe with
    // no candidate (empty bucket) counts as a miss.
    val bf = SimilarityOps.q31.build(spark, sf)
      .select(col("a_id"), col("sim").as("bf_sim"))
    val lsh = SimilarityOps.q31b.build(spark, sf)
      .select(col("a_id"), col("sim").as("ann_sim"))
    val hits = bf.join(lsh, Seq("a_id"), "left")
      .filter(col("ann_sim").isNotNull &&
        col("ann_sim") >= col("bf_sim") - 1e-9)
      .count()
    val total = bf.count()
    val recall = hits.toDouble / total
    info(f"LSH recall@1 = $recall%.3f ($hits/$total)")
    assert(recall >= 0.8, f"LSH recall@1 $recall%.3f ($hits/$total)")
  }

  test("q173 PQ-ADC ANN: recall@1 vs brute force; encode deterministic") {
    val bf = SimilarityOps.q31.build(spark, sf)
      .select(col("a_id"), col("sim").as("bf_sim"))
    val pq = SimilarityOps.q173.build(spark, sf)
      .select(col("a_id"), col("sim").as("ann_sim"))
    val hits = bf.join(pq, Seq("a_id"), "left")
      .filter(col("ann_sim").isNotNull &&
        col("ann_sim") >= col("bf_sim") - 1e-9)
      .count()
    val total = bf.count()
    val recall = hits.toDouble / total
    info(f"PQ recall@1 = $recall%.3f ($hits/$total)")
    // trained per-subspace codebook holds 0.96 on this fixture (the
    // first-K-seeds codebook it replaced measured the same but with no
    // margin in how codewords cover the subspace density)
    assert(recall >= 0.96, f"PQ recall@1 $recall%.3f ($hits/$total)")
    // deterministic end-to-end: same codebook, same codes, same answer
    val again = SimilarityOps.q173.build(spark, sf).collect()
    val first = SimilarityOps.q173.build(spark, sf).collect()
    assert(first.map(r => (r.getLong(0), r.getLong(1)))
      .sameElements(again.map(r => (r.getLong(0), r.getLong(1)))))
  }

  test("q203 IVF-ADC composed ANN: recall@1 vs brute force; deterministic") {
    val bf = SimilarityOps.q31.build(spark, sf)
      .select(col("a_id"), col("sim").as("bf_sim"))
    val ann = SimilarityOps.q203.build(spark, sf)
      .select(col("a_id"), col("sim").as("ann_sim"))
    val hits = bf.join(ann, Seq("a_id"), "left")
      .filter(col("ann_sim").isNotNull &&
        col("ann_sim") >= col("bf_sim") - 1e-9)
      .count()
    val total = bf.count()
    val recall = hits.toDouble / total
    info(f"IVFADC recall@1 = $recall%.3f ($hits/$total)")
    assert(recall >= 0.9, f"IVFADC recall@1 $recall%.3f ($hits/$total)")
    val a = SimilarityOps.q203.build(spark, sf).collect()
    val b = SimilarityOps.q203.build(spark, sf).collect()
    assert(a.map(r => (r.getLong(0), r.getLong(1)))
      .sameElements(b.map(r => (r.getLong(0), r.getLong(1)))))
  }

  test("lloyd codebook training is deterministic and covers all clusters") {
    val pts = Array.tabulate(200)(i =>
      Array.tabulate(4)(j => ((i * 31 + j * 7) % 97).toDouble))
    val a = SimilarityOps.lloyd(pts, 16)
    val b = SimilarityOps.lloyd(pts, 16)
    assert(a.length === 16)
    a.zip(b).foreach { case (x, y) => assert(x.sameElements(y)) }
    // converged centroids are means of their members: every centroid
    // must lie inside the data's bounding box
    val lo = (0 until 4).map(j => pts.map(_(j)).min)
    val hi = (0 until 4).map(j => pts.map(_(j)).max)
    a.foreach(c => (0 until 4).foreach(j =>
      assert(c(j) >= lo(j) && c(j) <= hi(j))))
  }

  test("q31d IVF ANN: recall@1 >= 0.9 vs brute force (trained centroids)") {
    val bf = SimilarityOps.q31.build(spark, sf)
      .select(col("a_id"), col("sim").as("bf_sim"))
    val ivf = SimilarityOps.q31d.build(spark, sf)
      .select(col("a_id"), col("sim").as("ann_sim"))
    val hits = bf.join(ivf, Seq("a_id"), "left")
      .filter(col("ann_sim").isNotNull &&
        col("ann_sim") >= col("bf_sim") - 1e-9)
      .count()
    val total = bf.count()
    val recall = hits.toDouble / total
    info(f"IVF recall@1 = $recall%.3f ($hits/$total)")
    // lloyd-converged coarse quantizer: 0.96 measured at nprobe=4
    // (was 0.82 with the single-iteration centroids)
    assert(recall >= 0.9, f"IVF recall@1 $recall%.3f ($hits/$total)")
  }

  test("q32 langid: every doc classified, score >= 0") {
    val df = TextOps.q32.build(spark, sf).cache()
    assert(df.count() === Tables.documents(spark, sf).count())
    assert(df.filter(col("score") < 0).count() === 0)
  }

  test("q35 fingerprint: order-sensitive (position-weighted)") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta", "en"), (2L, "beta alpha", "en"))
      .toDF("doc_id", "text", "lang")
    val toks = TextOps.tokensWithPos(docs)
      .withColumn("term",
        (TextOps.tokHash(col("tok")) * ((col("pos") * lit(2654435761L)) % TextOps.P)) % TextOps.P)
      .groupBy("doc_id").agg((sum(col("term")) % TextOps.P).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(toks(1L) !== toks(2L))
  }

  test("multimodal decode: every synthesized PNG really decodes to its " +
    "generation parameters via javax.imageio") {
    val metas = MultimodalOps.decodeMedia(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(metas.length.toLong === nDocs)
    metas.foreach { m =>
      val (w, h) = MultimodalOps.dimsOf(m.doc_id)
      assert(m.width === w.toLong && m.height === h.toLong,
        s"doc ${m.doc_id}: decoded ${m.width}x${m.height}, expected ${w}x$h")
      assert(m.channels === 1L)
      // exact pixel sum: Σ over raster of (x + y + id) mod 256 — proves
      // the decoder read the SAMPLES, not just the header
      var expect = 0L
      for (y <- 0 until h; x <- 0 until w)
        expect += (x + y + m.doc_id) % 256
      assert(m.px_sum === expect, s"doc ${m.doc_id} pixel sum")
      // a PNG is bigger than its 8-byte signature and carries one
      assert(m.byte_len > 8L)
    }
  }

  test("image decode handles corrupt and non-image payloads gracefully") {
    import MultimodalOps.ImageCodec
    val good = ImageCodec.encodePng(12, 9, 7L)
    assert(ImageCodec.decodeMeta(good).contains((12, 9, 1, {
      var s = 0L
      for (y <- 0 until 9; x <- 0 until 12) s += (x + y + 7) % 256
      s
    })))
    // truncated PNG: decoder must not throw
    assert(ImageCodec.decodeMeta(good.take(20)).isEmpty)
    // arbitrary non-image bytes
    assert(ImageCodec.decodeMeta("not an image".getBytes("UTF-8")).isEmpty)
    assert(ImageCodec.decodeMeta(Array.emptyByteArray).isEmpty)
    // RGB decode reports 3 bands (decoder is not gray-only)
    val img = new java.awt.image.BufferedImage(5, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFF0000)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val rgb = ImageCodec.decodeMeta(bos.toByteArray)
    assert(rgb.map(r => (r._1, r._2, r._3)).contains((5, 4, 3)))
  }

  test("wav decode recovers exact PCM samples; corrupt payloads quarantine") {
    import MultimodalOps.AudioCodec
    val good = AudioCodec.encodeWav(100, 8000, 7L)
    val decoded = AudioCodec.decodeMeta(good)
    assert(decoded.isDefined)
    val (rate, ch, bits, frames, sum) = decoded.get
    assert((rate, ch, bits, frames) === (8000, 1, 16, 100L))
    val expected = (0 until 100).map(i =>
      (i.toLong * 31 + 7L * 17) % 65536 - 32768).sum
    assert(sum === expected, "PCM round trip must be bit-exact")
    // truncated container: quarantine, never a throw
    assert(AudioCodec.decodeMeta(good.take(16)).isEmpty)
    assert(AudioCodec.decodeMeta("not audio".getBytes("UTF-8")).isEmpty)
    assert(AudioCodec.decodeMeta(Array.emptyByteArray).isEmpty)
    // a PNG is not audio either (cross-modality confusion)
    assert(AudioCodec.decodeMeta(
      MultimodalOps.ImageCodec.encodePng(8, 8, 1L)).isEmpty)
  }

  test("q82 media bundles reconstruct every payload by (offset, len) slice") {
    val idx = MultimodalOps.q82.build(spark, sf)
      .collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap // doc_id -> (lang, bundle, offset, len)
    val bundles = MultimodalOps.buildBundles(spark, sf)
      .collect()
      .map(b => (b.lang, b.bundle_id) -> b).toMap
    val payloads = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text").cast("binary"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(idx.size === payloads.size)
    // every payload must read back from its bundle at [offset, offset+len)
    payloads.foreach { case (docId, bytes) =>
      val (lang, bid, off, len) = idx(docId)
      val b = bundles((lang, bid))
      assert(len === bytes.length.toLong)
      assert(b.bytes.slice(off.toInt, (off + len).toInt).sameElements(bytes),
        s"doc $docId mismatch in bundle ($lang, $bid)")
    }
    // bundles overshoot the 16 KB budget by at most one payload
    val maxLen = payloads.values.map(_.length).max
    bundles.values.foreach { b =>
      assert(b.bytes.length <= 16384 + maxLen)
    }
  }

  test("native DotProduct expression is bit-identical to the higher-order form") {
    val emb = Tables.embeddings(spark, sf).limit(200)
    val diff = emb.select(
        graft.plans.VectorExpressions.dotNative(col("embedding"), col("embedding")).as("n"),
        graft.functions.SimilarityOps.dotHof(col("embedding"), col("embedding")).as("h"))
      .filter(col("n") =!= col("h"))
    assert(diff.count() === 0)
  }

  test("native DotProduct participates in WholeStageCodegen") {
    val plan = Tables.embeddings(spark, sf)
      .select(graft.plans.VectorExpressions.dotNative(col("embedding"), col("embedding")).as("d"))
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix marks operators fused into WholeStageCodegen
    assert(plan.contains("*(1) Project"), plan)
  }

  test("q31d IVF ANN: one result per probe, never beats brute force") {
    val bf = SimilarityOps.q31.build(spark, sf)
      .select(col("a_id"), col("sim").as("bf_sim"))
    val ivf = SimilarityOps.q31d.build(spark, sf).cache()
    assert(ivf.count() === ivf.select("a_id").distinct().count())
    val worse = bf.join(ivf.select(col("a_id"), col("sim").as("ivf_sim")), "a_id")
      .filter(col("ivf_sim") > col("bf_sim") + 1e-9)
    assert(worse.count() === 0)
  }

  test("graft_dot resolves from SQL after GraftRules.install") {
    graft.plans.GraftRules.install(spark)
    Tables.embeddings(spark, sf).limit(5).createOrReplaceTempView("emb_ext")
    val out = spark.sql("SELECT graft_dot(embedding, embedding) AS d FROM emb_ext")
    assert(out.count() === 5)
    assert(out.filter(col("d") < 0).count() === 0)
  }

  test("GraftExtensions injects rule + function without error") {
    // builder-time path: getOrCreate() would reuse the shared test
    // session, so drive the injector directly
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(exts)
  }

  test("q73 pii scrub: planted PII is gone from clean text, counts positive") {
    val df = TextOps.q73.build(spark, sf).cache()
    assert(df.count() > 0)
    // each row planted exactly one email, one phone, one IP
    assert(df.filter(col("n_email") =!= 1 || col("n_phone") =!= 1 ||
      col("n_ip") =!= 1).count() === 0)
    // nothing PII-shaped survives in the scrubbed text
    val leaks = df.filter(
      col("clean").rlike("[a-z0-9]+@") ||
        col("clean").rlike("[+]1-555-[0-9]") ||
        col("clean").rlike("[0-9]+[.][0-9]+[.][0-9]+[.][0-9]+"))
    assert(leaks.count() === 0)
    assert(df.filter(!col("clean").contains("<EMAIL>")).count() === 0)
  }

  test("q74 url dedup: partition of the corpus, canonical form is clean") {
    val df = DedupOps.q74.build(spark, sf).cache()
    assert(df.agg(sum("n_docs")).head().getLong(0) ===
      Tables.documents(spark, sf).count())
    assert(df.select("keeper").distinct().count() === df.count())
    val dirty = df.filter(
      col("canon").contains("://") || col("canon").contains("?") ||
        col("canon").rlike("^www[.]") || col("canon").rlike("/$") ||
        col("canon") =!= lower(col("canon")))
    assert(dirty.count() === 0)
  }

  test("BPE learn: hand-computed merges on a tiny fixture") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b c a b", "xx"),
      (2L, "a b a", "xx"))
      .toDF("doc_id", "text", "lang")
    val merges = TextOps.learnBpeMerges(docs, 2)
    // round 1: (a,b) occurs 4 times (3 in doc1, 1 in doc2) — clear max.
    // after merging, doc1 = [ab, ab, c, ab], doc2 = [ab, a]; round-2
    // pairs all have count 1, tie-break asc picks ("a b","a")
    assert(merges == Seq(
      ("xx", 1, "a", "b", 4L),
      ("xx", 2, "a b", "a", 1L)), merges.toString)
  }

  test("BPE mergeOnce: greedy non-overlap on repeated tokens") {
    // "a a a" has 2 counted pairs but only 1 non-overlapping application
    assert(TextOps.mergeOnce(IndexedSeq("a", "a", "a"), "a", "a") ==
      IndexedSeq("a a", "a"))
    assert(TextOps.mergeOnce(IndexedSeq("a", "a", "a", "a"), "a", "a") ==
      IndexedSeq("a a", "a a"))
    assert(TextOps.mergeOnce(IndexedSeq("x"), "a", "b") == IndexedSeq("x"))
    assert(TextOps.mergeOnce(IndexedSeq(), "a", "b") == IndexedSeq())
  }

  test("q93 merge table: 3 steps per lang, freqs non-increasing, shrinkage") {
    val merges = TextOps.q93.build(spark, sf).collect()
    val langs = Tables.documents(spark, sf).select("lang").distinct().count()
    assert(merges.length == 3 * langs, s"expected 3 merges x $langs langs")
    merges.groupBy(_.getString(0)).foreach { case (lang, rows) =>
      val freqs = rows.sortBy(_.getInt(1)).map(_.getLong(4))
      assert(freqs.forall(_ >= 1))
      // each learned merge's frequency can't exceed the previous round's
      // max (merging only removes or preserves adjacencies of others...
      // except pairs INVOLVING the new merged unit, which are new — so
      // only assert positivity plus determinism across two runs)
      val again = TextOps.q93.build(spark, sf).collect()
        .filter(_.getString(0) == lang).sortBy(_.getInt(1)).map(_.getLong(4))
      assert(freqs.sameElements(again), s"$lang nondeterministic")
    }
  }

  test("q95 ngram LM: one score per multi-token doc, log-probs negative, " +
    "bigram count = tokens - 1") {
    val df = TextOps.q95.build(spark, sf).cache()
    assert(df.count() === df.select("doc_id").distinct().count())
    // smoothed probabilities are < 1, so every log term and mean is < 0
    assert(df.filter(col("avg_logp") >= 0 || col("sum_logp") >= 0).count() === 0)
    // a doc with n whitespace tokens has exactly n-1 scored bigrams
    val toks = TextOps.q34.build(spark, sf).select("doc_id", "n_ws_tokens")
    val bad = df.join(toks, "doc_id")
      .filter(col("n_bigrams") =!= col("n_ws_tokens") - 1)
    assert(bad.count() === 0)
    // docs with < 2 tokens (no bigrams) are the only ones absent
    val absent = toks.join(df, Seq("doc_id"), "left_anti")
    assert(absent.filter(col("n_ws_tokens") >= 2).count() === 0)
  }

  test("q106 bpe encode: shrinks exactly where merges fired, digest deterministic") {
    val df = TextOps.q106.build(spark, sf).cache()
    assert(df.count() === Tables.documents(spark, sf).count())
    assert(df.filter(col("n_encoded") > col("n_raw")).count() === 0)
    assert(df.filter(col("ratio") <= 0 || col("ratio") > 1).count() === 0)
    // languages with a learned merge of freq > 0 must compress somewhere
    val merges = TextOps.learnBpeMerges(Tables.documents(spark, sf), 3)
    val langsWithMerges = merges.filter(_._5 > 0).map(_._1).toSet
    val shrunkLangs = df.filter(col("n_encoded") < col("n_raw"))
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langsWithMerges.subsetOf(shrunkLangs))
    // exact encoding pinned: digests identical across two runs
    val again = TextOps.q106.build(spark, sf).collect().map(_.getString(5))
    assert(df.collect().map(_.getString(5)).sameElements(again))
  }

  test("q98 semdedup: total partition, seeds self-kept, drop rule exact") {
    val df = SimilarityOps.q98.build(spark, sf).cache()
    val emb = Tables.embeddings(spark, sf)
    assert(df.count() === emb.count())
    // seeds land in their own cell (cos(v,v)=1 beats everything) and survive
    val seeds = df.filter(col("vec_id") < 8).collect()
    seeds.foreach { r =>
      assert(r.getLong(1) === r.getLong(0), "seed not in own cell")
      assert(r.getBoolean(2), "seed dropped")
    }
    // recompute the verdict brute-force on the driver and compare exactly
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble))
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val cells = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val verdict = df.collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    for ((b, cell) <- cells) {
      val expectDrop = cells.exists { case (a, ca) =>
        ca == cell && a < b && cos(vecs(a), vecs(b)) > 0.4
      }
      assert(verdict(b) === !expectDrop, s"vec $b verdict mismatch")
    }
  }

  test("q98 semdedup: k is an executable knob — doubling granularity shrinks " +
    "the per-cell quadratic; any k partitions totally and keeps seeds") {
    val n = Tables.embeddings(spark, sf).count()
    def cellProfile(k: Int): (Long, Long, Long) = {
      val sizes = SimilarityOps.semdedupCells(spark, sf, k)
        .groupBy("cell").count().collect().map(_.getLong(1))
      (sizes.length.toLong, sizes.max, sizes.map(c => c * c).sum)
    }
    val (cells4, max4, quad4) = cellProfile(4)
    val (cells16, max16, quad16) = cellProfile(16)
    // total partition at every k
    assert(SimilarityOps.semdedup(spark, sf, 4).count() === n)
    assert(SimilarityOps.semdedup(spark, sf, 16).count() === n)
    assert(cells4 === 4L && cells16 === 16L, "a seed cell went empty")
    // the claim from the scaladoc, executed: finer granularity bounds
    // the within-cell pair work (Σ c², the join's candidate count) and
    // the worst cell, which is what must stay fixed as n grows 100×
    assert(quad16 < quad4,
      s"per-cell quadratic did not shrink: k=16 -> $quad16, k=4 -> $quad4")
    assert(max16 <= max4,
      s"max cell grew with finer granularity: $max16 > $max4")
    // seeds always survive at any k (first occupant of their own cell)
    SimilarityOps.semdedup(spark, sf, 16)
      .filter(col("vec_id") < 16).collect()
      .foreach(r => assert(r.getBoolean(2), s"seed ${r.getLong(0)} dropped"))
  }

  test("q227 boundedCells: a deliberately skewed corpus (70% near-identical) " +
    "still yields max occupancy <= cap and pair work <= cells * cap^2") {
    import spark.implicits._
    val cap = 16
    val n = 500
    // 350 vectors share one dominant direction (tiny deterministic
    // perturbations keep them distinct but cosine-~1 — the worst case
    // for seed quantization: no seed choice separates them); 150 spread
    // over 8 one-hot directions
    val rows = (0 until n).map { i =>
      val e = Array.fill(8)(0.0f)
      if (i < 350) {
        e(0) = 1.0f
        e(1 + i % 7) = 0.001f * (1 + i % 13)
      } else {
        e(i % 8) = 1.0f + 0.01f * (i % 5)
        e((i + 3) % 8) = 0.05f * (i % 3)
      }
      (i.toLong, e.toSeq)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val cells = SimilarityOps.boundedCells(emb, cap)
      .select("vec_id", "cell_id").cache()
    try {
      // total partition: every vector lands in exactly one final cell
      assert(cells.count() === n.toLong)
      assert(cells.select("vec_id").distinct().count() === n.toLong)
      val sizes = cells.groupBy("cell_id").count()
        .collect().map(_.getLong(1))
      val nCells = sizes.length.toLong
      // the HARD bound the fixed-k form cannot give: no final cell
      // exceeds the cap, so the within-cell pair join is bounded by
      // cells*cap^2 BY CONSTRUCTION, whatever the skew
      assert(sizes.max <= cap.toLong,
        s"occupancy bound violated: max cell ${sizes.max} > cap $cap")
      assert(sizes.map(c => c * c).sum <= nCells * cap.toLong * cap,
        "candidate-pair bound violated")
      // the pathological path actually executed: the dominant cluster
      // forced sub-seed splits (sub >= 0) and rank chunking (chunk > 0)
      val ids = cells.select("cell_id").distinct()
        .collect().map(_.getString(0))
      assert(ids.exists(id => !id.contains(".-1#")),
        "no cell was sub-seed split — the corpus was not skewed enough")
      assert(ids.exists(id => id.split("#")(1).toLong > 0),
        "no cell was rank-chunked — the hard bound was never exercised")
    } finally cells.unpersist()
  }

  test("q125 bm25: 50 ranked hits, scores descending, hits contain a query term") {
    val df = TextOps.q125.build(spark, sf).cache()
    assert(df.count() === 50)
    val rows = df.orderBy("rank").collect()
    assert(rows.map(_.getLong(0)).toSeq === (1L to 50L))
    val scores = rows.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(scores.forall(_ > 0))
    // the corpus's top-3 tokens really appear in the top hit
    val top3 = TextOps.tokensWithPos(Tables.documents(spark, sf))
      .groupBy("tok").count()
      .orderBy(col("count").desc, col("tok").asc)
      .limit(3).collect().map(_.getString(0)).toSet
    val topDoc = Tables.documents(spark, sf)
      .filter(col("doc_id") === rows.head.getLong(1))
      .head().getAs[String]("text").toLowerCase.split("\\s+").toSet
    assert(top3.exists(topDoc.contains))
  }

  test("q126 feature hash: one vector per doc, deterministic by feature triple") {
    val df = TextOps.q126.build(spark, sf).cache()
    val n = Tables.documents(spark, sf).count()
    assert(df.count() === n)
    df.collect().foreach { r =>
      assert(r.getLong(1) >= 1 && r.getLong(1) <= 4)
      assert(r.getString(2).matches("(\\d{2}:-?\\d+)(,\\d{2}:-?\\d+)*"))
    }
    // identical (lang, source, length-bucket) => identical vector
    val keyed = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("source"),
        expr("n_chars DIV 500").as("lb"))
      .join(df, "doc_id")
    val multi = keyed.groupBy("lang", "source", "lb")
      .agg(countDistinct(col("vec")).as("nv"))
      .filter(col("nv") > 1)
    assert(multi.count() === 0)
  }

  test("q132 ndcg: dcg/idcg recompute from graded relevance, ndcg in [0,1]") {
    val df = TextOps.q132.build(spark, sf).cache()
    val docs = Tables.documents(spark, sf)
    val top3 = TextOps.tokensWithPos(docs).groupBy("tok").count()
      .orderBy(col("count").desc, col("tok").asc)
      .limit(3).collect().map(_.getString(0)).toSet
    val rel = docs.select("doc_id", "lang", "n_chars", "text").collect().map { r =>
      val toks = r.getString(3).toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
      (r.getLong(0), r.getString(1), r.getLong(2), top3.count(toks.contains).toLong)
    }
    val disc = Array(1000000L, 630930L, 500000L, 430677L, 386853L, 356207L,
      333333L, 315465L, 301030L, 289065L)
    df.collect().foreach { r =>
      val in = rel.filter(_._2 == r.getString(0))
      val dcg = in.sortBy(d => (-d._3, d._1)).take(10).zipWithIndex
        .map { case (d, i) => d._4 * disc(i) }.sum
      val idcg = in.sortBy(d => (-d._4, d._1)).take(10).zipWithIndex
        .map { case (d, i) => d._4 * disc(i) }.sum
      assert(r.getLong(1) === dcg)
      assert(r.getLong(2) === idcg)
      assert(idcg >= dcg)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("q133 kappa: confusion recompute from marker argmax, kappa <= accuracy") {
    val df = TextOps.q133.build(spark, sf).cache()
    val r = df.head()
    val pred = Tables.documents(spark, sf).select("doc_id", "lang", "text")
      .collect().map { d =>
        val toks = d.getString(2).toLowerCase.split("\\s+").filter(_.nonEmpty)
        val byCand = toks.toSeq.flatMap(t => TextOps.markers.filter(_._1 == t).map(_._2))
          .groupBy(identity).view.mapValues(_.size).toMap
        val p = if (byCand.isEmpty) "und"
          else byCand.toSeq.sortBy { case (c, n) => (-n, c) }.head._1
        (d.getString(1), p)
      }
    val n = pred.length.toLong
    val agree = pred.count { case (l, p) => l == p }.toLong
    assert(r.getLong(0) === n)
    assert(r.getLong(1) === agree)
    val rm = pred.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cm = pred.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val sumRc = rm.map { case (l, c) => c * cm.getOrElse(l, 0L) }.sum
    val kappa = (n * agree - sumRc).toDouble / (n * n - sumRc).toDouble
    assert(math.abs(r.getDouble(2) - agree.toDouble / n) < 1e-12)
    assert(math.abs(r.getDouble(3) - kappa) < 1e-12)
    // chance correction can only lower the score
    assert(r.getDouble(3) <= r.getDouble(2) + 1e-12)
  }

  test("q137 prefix-filtered setsim join: lossless vs brute-force all-pairs") {
    val df = DedupOps.q137.build(spark, sf).cache()
    val sets = TextOps.shinglesOf(Tables.documents(spark, sf), distinct = true)
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ids = sets.keys.toSeq.sorted
    val naive = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      inter = (sets(a) & sets(b)).size.toLong
      if 5 * inter >= 3 * (sets(a).size + sets(b).size - inter)
    } yield (a, b, inter)).toSet
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === naive)
    assert(naive.nonEmpty) // fixture has near-dups; empty would be vacuous
    df.collect().foreach { r =>
      val u = sets(r.getLong(0)).size + sets(r.getLong(1)).size - r.getLong(2)
      assert(math.abs(r.getDouble(3) - r.getLong(2).toDouble / u) < 1e-12)
      assert(r.getDouble(3) >= 0.6 - 1e-12)
    }
  }

  test("setsim skew armor: a shingle in 50% of docs yields candidates " +
    "== near-dup mass, never a quadratic bucket; output stays exact") {
    import spark.implicits._
    // 445 docs, one shingle HOT in half of them:
    //  - 200 docs {HOT} ∪ 9 unique shingles  (distinct content)
    //  - 200 docs with 10 unique shingles    (clean background)
    //  - 5 true near-dup pairs sharing 8/10 unique shingles (J=0.667)
    //  - 20 identical docs {HOT, x, y}       (true-dup clique, J=1)
    val rows = Seq.newBuilder[(Long, String)]
    for (i <- 0 until 200) {
      rows += ((i.toLong, "HOT"))
      for (j <- 0 until 9) rows += ((i.toLong, s"u_${i}_$j"))
    }
    for (i <- 200 until 400; j <- 0 until 10)
      rows += ((i.toLong, s"u_${i}_$j"))
    for (i <- 0 until 5) {
      for (j <- 0 until 8) {
        rows += ((1000L + i, s"p_${i}_$j")); rows += ((2000L + i, s"p_${i}_$j"))
      }
      for (j <- 8 until 10) {
        rows += ((1000L + i, s"a_${i}_$j")); rows += ((2000L + i, s"b_${i}_$j"))
      }
    }
    for (i <- 3000 until 3020)
      Seq("HOT", "xx", "yy").foreach(t => rows += ((i.toLong, t)))
    val sh = rows.result().toDF("doc_id", "sh").repartition(8).cache()

    val cands = DedupOps.setSimCandidates(sh).cache()
    val nCand = cands.count()
    // the HOT bucket alone would be 220·219/2 = 24 090 naive pairs;
    // rare-first prefixes exclude HOT wherever a doc has rarer content,
    // so candidates collapse to exactly the true near-dup mass:
    // 5 injected pairs + C(20,2) identical-doc pairs (irreducible —
    // they ARE the output)
    assert(nCand === 5L + 190L, s"candidate stage produced $nCand pairs")

    // and the pruning is still lossless: output == naive brute force
    val sets = rows.result().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val ids = sets.keys.toSeq.sorted
    val naive = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      inter = (sets(a) & sets(b)).size.toLong
      if 5 * inter >= 3 * (sets(a).size + sets(b).size - inter)
    } yield (a, b, inter)).toSet
    val got = DedupOps.setSimPairs(sh).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === naive)
    assert(naive.size === 195)
  }

  test("q138 negative sampling: 3 cross-lang negatives per doc, md5-deterministic") {
    val df = TextOps.q138.build(spark, sf).cache()
    val docs = Tables.documents(spark, sf).select("doc_id", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(df.count() === docs.length * 3L)
    val langOf = docs.toMap
    def res(sm: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(sm.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 15), 16) % 1000000007L
    val pool = docs.groupBy(_._2).view.mapValues(
      _.sortBy(d => (res(d._1.toString), d._1)).take(8).map(_._1)).toMap
    val byDoc = df.collect().groupBy(_.getLong(0))
    byDoc.foreach { case (anchor, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq === Seq(1L, 2L, 3L))
      rows.foreach { r =>
        assert(r.getString(3) != langOf(anchor)) // cross-language
        assert(pool(r.getString(3)).contains(r.getLong(2)))
      }
      // the picked 3 are the hash-minimal candidates over the full pool
      val cands = pool.filter(_._1 != langOf(anchor)).values.flatten
        .map(n => (res(s"$anchor:$n"), n)).toSeq.sorted.take(3).map(_._2)
      assert(rows.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq === cands)
    }
  }

  test("q140 mutual knn: pairs are symmetric cross-label top-1s, brute-force match") {
    val df = SimilarityOps.q140.build(spark, sf).cache()
    val emb = Tables.embeddings(spark, sf).collect().map { r =>
      (r.getLong(0), r.getInt(2), r.getSeq[Float](1).map(_.toDouble).toArray)
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val best = emb.map { case (id, lab, v) =>
      val cands = emb.filter(_._2 != lab)
        .map(o => (-cos(v, o._3), o._1)).sorted.head
      id -> cands._2
    }.toMap
    val naive = best.collect {
      case (a, b) if best(b) == a && a < b => (a, b)
    }.toSet
    assert(df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet === naive)
    assert(naive.nonEmpty)
    df.collect().foreach(r => assert(r.getInt(1) != r.getInt(3)))
  }

  test("q150 repeated spans: driver brute force over all 10-token windows") {
    val df = TextOps.q150.build(spark, sf).cache()
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").filter(_.nonEmpty))
    val wins = docs.flatMap { case (id, toks) =>
      if (toks.length >= 10) toks.sliding(10).map(w => (id, w.mkString(" ")))
      else Iterator.empty
    }
    val docsPerWin = wins.groupBy(_._2).view
      .mapValues(_.map(_._1).distinct.length).toMap
    val expect = wins.groupBy(_._1).view.mapValues { ws =>
      (ws.length.toLong, ws.count(w => docsPerWin(w._2) >= 2).toLong)
    }.toMap
    assert(df.count() === expect.size)
    assert(df.filter(col("n_repeated") > 0).count() > 0) // fixture has near-dups
    df.collect().foreach { r =>
      val (nw, nr) = expect(r.getLong(0))
      assert(r.getLong(1) === nw, s"doc ${r.getLong(0)} n_windows")
      assert(r.getLong(2) === nr, s"doc ${r.getLong(0)} n_repeated")
    }
  }

  test("q154 cooc pmi: driver recompute of pair doc-counts and pmi") {
    val df = TextOps.q154.build(spark, sf).cache()
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty).toSet)
    val nDocs = docs.length.toLong
    val dfreq = docs.toSeq.flatMap(_._2).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val top = dfreq.toSeq.sortBy { case (t, c) => (-c, t) }.take(50).toMap
    val pairCnt = scala.collection.mutable.Map[(String, String), Long]()
      .withDefaultValue(0L)
    docs.foreach { case (_, ts) =>
      val sel = ts.filter(top.contains).toSeq.sorted
      for (i <- sel.indices; j <- i + 1 until sel.size)
        pairCnt((sel(i), sel(j))) += 1
    }
    val expect = pairCnt.filter(_._2 >= 2)
    assert(df.count() === expect.size)
    assert(expect.nonEmpty)
    df.collect().foreach { r =>
      val k = (r.getString(0), r.getString(1))
      assert(r.getLong(2) === expect(k))
      assert(r.getLong(3) === top(k._1) && r.getLong(4) === top(k._2))
      val pmi = BigDecimal(math.log((expect(k) * nDocs).toDouble /
          (top(k._1) * top(k._2)).toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(5) - pmi) < 2e-6)
    }
  }

  test("q155 span cut: stitched survivors match a driver recompute") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val df = TextOps.q155.build(spark, sf).cache()
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").filter(_.nonEmpty))
      .filter(_._2.nonEmpty)
    val wins = docs.flatMap { case (id, toks) =>
      if (toks.length >= 10)
        toks.sliding(10).map(w => (id, w.mkString(" ")))
      else Iterator.empty
    }
    val docsPerWin = wins.groupBy(_._2).view
      .mapValues(_.map(_._1).distinct.length).toMap
    val expect = docs.map { case (id, toks) =>
      val cut = scala.collection.mutable.Set[Int]()
      if (toks.length >= 10)
        toks.sliding(10).zipWithIndex.foreach { case (w, i) =>
          if (docsPerWin(w.mkString(" ")) >= 2) (i until i + 10).foreach(cut += _)
        }
      val kept = toks.zipWithIndex.collect { case (t, i) if !cut(i) => t }
      id -> (toks.length.toLong, (toks.length - kept.length).toLong,
        md5hex(kept.mkString(" ")), kept.nonEmpty)
    }.toMap
    assert(df.count() === expect.count(_._2._4)) // fully-cut docs drop out
    assert(df.filter(col("n_cut") > 0).count() > 0)
    df.collect().foreach { r =>
      val (nt, nc, md, _) = expect(r.getLong(0))
      assert(r.getLong(1) === nt, s"doc ${r.getLong(0)} n_tok")
      assert(r.getLong(2) === nc, s"doc ${r.getLong(0)} n_cut")
      assert(r.getString(3) === md, s"doc ${r.getLong(0)} clean_md5")
    }
  }

  test("q163 shard manifest: driver recompute of membership and digests") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def shardOf(id: Long): Long =
      java.lang.Long.parseLong(md5hex(id.toString).take(15), 16) % 8L
    val rows = TextOps.q163.build(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byShard = docs.groupBy(d => shardOf(d._1))
    assert(rows.map(_.getLong(0)).toSet === byShard.keySet)
    rows.foreach { r =>
      val ds = byShard(r.getLong(0))
      assert(r.getLong(1) === ds.length.toLong)
      assert(r.getLong(2) ===
        ds.map(_._2.split("\\s+").count(_.nonEmpty).toLong).sum)
      assert(r.getLong(3) === ds.map(_._3).sum)
      assert(r.getString(4) === md5hex(ds.map(_._1).sorted.mkString(",")))
    }
  }

  test("q164 minhash eval: confusion matrix consistent with q28/q30 outputs") {
    val r = DedupOps.q164.build(spark, sf).head()
    val truth = DedupOps.q30.build(spark, sf)
      .select("a_doc", "b_doc").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val cand = DedupOps.q28.build(spark, sf)
      .select("a_doc", "b_doc").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val tp = (truth intersect cand).size.toLong
    assert(r.getLong(0) === truth.size.toLong)
    assert(r.getLong(1) === cand.size.toLong)
    assert(r.getLong(2) === tp)
    assert(r.getLong(3) === cand.size - tp)
    assert(r.getLong(4) === truth.size - tp)
    assert(r.getDouble(6) >= 0.8, s"recall ${r.getDouble(6)}") // the gate
  }

  test("q165 chain audit: pair algebra holds and matches cluster recompute") {
    val r = DedupOps.q165.build(spark, sf).head()
    val labels = DedupOps.q66.build(spark, sf)
      .select("doc_id", "cluster_id").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val byCluster = labels.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(r.getLong(0) === labels.length.toLong)
    assert(r.getLong(1) === byCluster.size.toLong)
    assert(r.getLong(2) === byCluster.values.max)
    val within = byCluster.values.map(c => c * (c - 1) / 2).sum
    assert(r.getLong(4) === within)
    assert(r.getLong(5) === r.getLong(4) - r.getLong(3)) // transitive = within - direct
    assert(r.getLong(5) >= 0)
  }

  test("q167 lsh sweep: monotone S-curve and r=4 row agrees with q164") {
    val rows = DedupOps.q167.build(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(2L, 4L, 8L))
    // permissive geometries (small r) find at least as many candidates
    // and at least as much recall as strict ones
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(2) >= b.getLong(2)) // n_cand monotone down in r
        assert(a.getDouble(5) >= b.getDouble(5)) // recall monotone down in r
      case _ =>
    }
    val r4 = rows.find(_.getLong(0) == 4L).get
    val q164r = DedupOps.q164.build(spark, sf).head()
    assert(r4.getLong(2) === q164r.getLong(1)) // n_cand
    assert(r4.getLong(3) === q164r.getLong(2)) // tp
    assert(r4.getLong(4) === q164r.getLong(0)) // n_truth
  }

  test("q168 rank correlation: driver Spearman recompute over both rankers") {
    val r = TextOps.q168.build(spark, sf).head()
    val bm = TextOps.q125.build(spark, sf).collect()
      .map(x => x.getLong(1) -> x.getLong(0)).toMap // doc -> rank_a
    // driver TF-IDF over the same corpus top-3 terms
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(x => x.getLong(0) -> x.getString(1).toLowerCase.split("\\s+")
        .filter(_.nonEmpty).toSeq)
    val n = docs.length
    val counts = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.length).toSeq
    val qterms = counts.sortBy { case (t, c) => (-c, t) }.take(3).map(_._1).toSet
    val df = qterms.map(t => t -> docs.count(_._2.contains(t))).toMap
    def scoreB(toks: Seq[String]): BigDecimal =
      qterms.toSeq.map { t =>
        val tf = toks.count(_ == t)
        if (tf == 0) BigDecimal(0)
        else BigDecimal(tf *
          (1.0 + BigDecimal(math.log((n + 1.0) / (df(t) + 1.0)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }.sum
    val scores = docs.filter(d => bm.contains(d._1))
      .map { case (id, toks) => (id, scoreB(toks)) }
    val rankB = scores.sortBy { case (id, sc) => (-sc, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    val sumD2 = bm.toSeq.map { case (id, ra) =>
      val d = ra - rankB(id); d * d
    }.sum
    assert(r.getLong(0) === bm.size.toLong)
    assert(r.getLong(1) === sumD2)
    val nn = bm.size.toLong
    assert(r.getDouble(2) === 1.0 - 6.0 * sumD2.toDouble / (nn * (nn * nn - 1)).toDouble)
    assert(math.abs(r.getDouble(2)) <= 1.0)
  }

  test("q185 entity resolution: thresholds hold; true registry rows dominate the matches") {
    val rows = DedupOps.q185.build(spark, sf).collect()
    // one best row per customer
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    var trueMatch = 0; var matched = 0
    rows.foreach { r =>
      val (cust, reg, dist, delta, m) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))
      if (m) {
        matched += 1
        assert(dist <= 3 && delta <= 5)
        if (reg === cust + 1000000L) trueMatch += 1
      }
    }
    assert(matched > 0)
    // the blocker + scorer recover the true registry row for the vast
    // majority of matches (false candidates lose on the balance delta)
    assert(trueMatch.toDouble / matched > 0.9)
  }

  test("q238 decontamination core at production n=13: planted verbatim " +
    "benchmark spans flag exactly the leaked docs, with exact counts") {
    import spark.implicits._
    val benchSpan = (1 to 13).map(i => s"ans$i").mkString(" ")
    val innocent = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      // the benchmark doc (membership rule: doc_id == 100)
      (100L, s"preamble $benchSpan postamble", "en"),
      // leaked: carries the full 13-gram verbatim, embedded mid-text
      (1L, s"$innocent $benchSpan trailing words here", "en"),
      // near miss: 12 of the 13 tokens (one dropped) — must NOT flag
      (2L, s"$innocent ${(1 to 12).map(i => s"ans$i").mkString(" ")}", "en"),
      // clean
      (3L, innocent, "en"),
      // leaked twice over two distinct benchmark windows (the doc also
      // contains the preamble-anchored 13-gram) — n_shared counts
      // DISTINCT shared grams
      (4L, s"preamble $benchSpan postamble extra", "en")
    ).toDF("doc_id", "text", "lang")
    val out = TextOps.decontaminate(docs, n = 13,
        isBench = col("doc_id") === 100L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet === Set(1L, 4L),
      s"exactly the leaked docs must flag, got ${out.keySet}")
    // doc 1: the span sits mid-text -> exactly the 1 pure-span gram
    // is shared (every other window mixes non-benchmark context)
    assert(out(1L)._1 === 1L)
    // doc 4 reproduces the benchmark's local context, so ALL 3 of the
    // benchmark doc's windows ("preamble <span> postamble" has 15
    // tokens -> 3 distinct 13-grams) match
    assert(out(4L)._1 === 3L)
    out.foreach { case (_, (shared, total, share)) =>
      assert(shared <= total && share > 0.0 && share <= 1.0)
    }
  }

  test("q243 span removal composes with q238: exactly the flagged docs " +
    "lose tokens, scrubbed docs carry no benchmark gram, clean docs " +
    "survive byte-identical") {
    val flagged = TextOps.q238.build(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val scrub = TextOps.q243.build(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val removedFrom = scrub.filter(_._2._2 > 0).keySet
    assert(removedFrom === flagged,
      s"span removal must hit exactly the q238 flags: $removedFrom vs $flagged")
    scrub.foreach { case (id, (before, removed, after)) =>
      assert(before === removed + after, s"doc $id token accounting")
    }
    // idempotence-shaped guarantee: re-running detection on the
    // SCRUBBED corpus finds nothing (no kept window still matches a
    // benchmark gram) — rebuild the kept text and re-detect
    import spark.implicits._
    val n = 4
    val isBench = pmod(col("doc_id"), lit(53)) === 7
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val toks = TextOps.tokensWithPos(Tables.documents(spark, sf))
      .select("doc_id", "pos", "tok")
    val leads = (1 until n).map(i => lead(col("tok"), i).over(w))
    val gramsPos = toks
      .withColumn("__ls", array(leads: _*))
      .filter(element_at(col("__ls"), n - 1).isNotNull)
      .select(col("doc_id"), col("pos"),
        concat_ws(" ", (col("tok") +:
          (1 until n).map(i => element_at(col("__ls"), i))): _*).as("g"))
    val bench = gramsPos.filter(isBench).select("g").distinct()
    val covered = gramsPos.filter(!isBench).join(bench, Seq("g"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("pos"))
      .distinct()
    val keptToks = toks.filter(!isBench)
      .join(covered, Seq("doc_id", "pos"), "left_anti")
    // re-gram the kept stream on its own (re-numbered) positions: the
    // removal may ABUT kept tokens into NEW adjacencies, but none of
    // the planted single-window leaks can reconstitute a bench gram
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val renum = keptToks
      .withColumn("p2", row_number().over(w2))
    val leads2 = (1 until n).map(i => lead(col("tok"), i).over(
      org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("p2")))
    val regrams = renum
      .withColumn("__ls", array(leads2: _*))
      .filter(element_at(col("__ls"), n - 1).isNotNull)
      .select(concat_ws(" ", (col("tok") +:
        (1 until n).map(i => element_at(col("__ls"), i))): _*).as("g"))
    assert(regrams.join(bench, Seq("g")).count() === 0L,
      "scrubbed corpus must re-detect clean")
  }
}
