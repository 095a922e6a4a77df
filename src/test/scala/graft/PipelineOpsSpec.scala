package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextOps
import graft.operators.{AnalyticOps, TemporalOps}

/** Invariant tests for the round-2 pipeline operators (q85–q89):
  * chunk coverage/reconstruction, session-consistency of the windowed
  * dedup, stratified-sample bounds, and tournament-vs-flat reservoir
  * equality. The DuckDB hash oracle proves value equality; these prove
  * the SEMANTIC claims the oracles can't state.
  */
class PipelineOpsSpec extends SparkTestBase {

  test("q86 chunks tile each document: stride-40 starts, full coverage") {
    val rows = TextOps.q86.build(spark, sf)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        min("start_tok").as("first_start"),
        max(col("start_tok") + col("n_tok") - 1).as("last_end"),
        max("start_tok").as("max_start"))
      .collect()
    val nTok = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit("\\S+"), lit(0))).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (docId, nChunks) = (r.getLong(0), r.getLong(1))
      val n = nTok(docId)
      assert(r.getLong(2) == 1L, s"doc $docId first chunk must start at 1")
      assert(r.getLong(3) == n, s"doc $docId chunks must cover all $n tokens")
      assert(r.getLong(4) == (nChunks - 1) * 40 + 1, s"doc $docId stride drift")
      val expected = math.ceil(math.max(n - 50, 0) / 40.0).toLong + 1
      assert(nChunks == expected, s"doc $docId chunk count $nChunks != $expected")
    }
  }

  test("q86 chunk texts reconstruct the original token stream") {
    // stitching rule: every chunk contributes its first 40 tokens, the
    // last chunk contributes all of its tokens (stride < size => the
    // 10-token overlap is dropped from each non-final chunk)
    val docs = Tables.documents(spark, sf).limit(25)
    val chunks = docs
      .select(col("doc_id"),
        regexp_extract_all(col("text"), lit("\\S+"), lit(0)).as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toMap
    val got = TextOps.q86.build(spark, sf)
      .filter(col("doc_id").isin(chunks.keys.toSeq: _*))
      .orderBy("doc_id", "chunk_id")
      .collect()
      .groupBy(_.getLong(0))
    got.foreach { case (docId, rows) =>
      val orig = chunks(docId)
      val stitched = rows.sortBy(_.getLong(1)).zipWithIndex.flatMap {
        case (r, i) =>
          val start = r.getLong(2).toInt - 1
          val len = r.getLong(3).toInt
          val piece = orig.slice(start, start + len)
          // verify the md5 actually matches this slice's text
          val md = java.security.MessageDigest.getInstance("MD5")
            .digest(piece.mkString(" ").getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
          assert(md == r.getString(4), s"doc $docId chunk $i md5 mismatch")
          if (i == rows.length - 1) piece else piece.take(40)
      }
      assert(stitched.toSeq == orig.toSeq,
        s"doc $docId stitched tokens != original")
    }
  }

  test("q87 windowed dedup keeps exactly one event per session_window") {
    val kept = TemporalOps.q87.build(spark, sf).count()
    val sessions = Tables.events(spark, sf)
      .withColumn("tss",
        timestamp_seconds(expr("ts div 1000000000")).cast("timestamp_ntz"))
      .groupBy(col("user_id"), col("event_type"),
        session_window(col("tss"), "86400 seconds"))
      .count()
      .count()
    assert(kept == sessions,
      s"kept $kept != session count $sessions (same 86400s gap rule)")
  }

  test("q88 stratified sample respects per-stratum thresholds and determinism") {
    val docs = Tables.documents(spark, sf)
    val counts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = AnalyticOps.q88.build(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.foreach { case (lang, n) =>
      val got = sampled.getOrElse(lang, 0L)
      val thr = math.min(10000L, 10000L * 50 / n)
      if (thr == 10000L) assert(got == n, s"$lang below target must keep all")
      else {
        // hash-threshold sampling: expected ~ n*thr/10000, loose 3-sigma band
        val exp = n.toDouble * thr / 10000.0
        val sd = math.sqrt(exp)
        assert(math.abs(got - exp) <= 4 * sd + 2,
          s"$lang sample $got far from expectation $exp")
      }
    }
    // deterministic: a second build returns the identical id set
    val a = AnalyticOps.q88.build(spark, sf).select("doc_id").collect().map(_.getLong(0)).toSet
    val b = AnalyticOps.q88.build(spark, sf).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("q89 hierarchical reservoir equals the flat one-level bottom-k") {
    val docs = Tables.documents(spark, sf)
      .withColumn("h", md5(concat(lit("rsv:"), col("doc_id"))))
    val flat = docs
      .withColumn("rk",
        row_number().over(Window.partitionBy("source").orderBy("h", "doc_id")))
      .filter(col("rk") <= 5)
      .select("source", "rk", "doc_id", "h")
    val got = AnalyticOps.q89.build(spark, sf)
      .select("source", "rk", "doc_id", "h")
    assert(got.exceptAll(flat).isEmpty && flat.exceptAll(got).isEmpty,
      "tournament selection diverged from flat bottom-k")
  }

  test("q85 domain stats partition the corpus") {
    val rows = TextOps.q85.build(spark, sf).collect()
    assert(rows.length == 20, "one domain per source")
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      Tables.documents(spark, sf).count())
    rows.foreach(r =>
      assert(r.getAs[String]("domain").matches("src\\d+[.]example[.]com")))
  }

  test("q174 quantile normalization: order preserved per lang, global range shared") {
    val rows = TextOps.q174.build(spark, sf).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length === Tables.documents(spark, sf).count())
    // within a language, calibrated must be monotone in (raw, then ppm)
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val sorted = rs.sortBy(t => (t._2, t._3))
      val cal = sorted.map(_._4)
      assert(cal.zip(cal.tail).forall { case (a, b) => a <= b },
        s"calibrated not monotone within $lang")
    }
    // every language's extremes land on the ONE pooled distribution
    val globalRaw = rows.map(_._2)
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      assert(rs.minBy(t => (t._2, t._3))._4 === globalRaw.min,
        s"$lang p0 must calibrate to the pooled minimum")
      assert(rs.maxBy(t => (t._2, t._3))._4 === globalRaw.max,
        s"$lang p100 must calibrate to the pooled maximum")
    }
  }

  test("q187 mixture plan: integer feasibility — rates <= 1, binding lang saturates") {
    val rows = TextOps.q187.build(spark, sf).collect()
    assert(rows.length === 5)
    assert(rows.map(_.getLong(1)).sum === 1000000L)
    val budget = rows.head.getLong(3)
    rows.foreach { r =>
      val (w, tok, b, planned, rate) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(b === budget)
      assert(planned === b * w / 1000000L)
      assert(planned <= tok)          // never oversample: rate <= 1
      assert(rate <= 1000000L)
    }
    // the binding language is within integer-floor slack of full use
    assert(rows.map(_.getLong(5)).max >= 990000L)
  }

  test("q188 pack efficiency: n_seqs consistent with q78's seq ids; waste telescopes") {
    val audit = TextOps.q188.build(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    // recompute n_seqs per lang from q78's packing: a stripe's sequence
    // count is its last doc's (end_tok - 1) div 512 + 1
    val stripes = TextOps.q78.build(spark, sf)
      .withColumn("end_tok", col("seq_id") * 512 + col("seq_offset") + col("n_tokens"))
      .groupBy("lang", "shard")
      .agg(max(expr("(end_tok - 1) div 512")).as("last_seq"),
        sum(col("n_tokens")).as("toks"))
      .groupBy("lang")
      .agg(sum(col("last_seq") + 1).as("n_seqs"), sum(col("toks")).as("toks"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(audit.keySet === stripes.keySet)
    audit.foreach { case (lang, r) =>
      val (nSeqs, toks) = stripes(lang)
      assert(r.getLong(3) === nSeqs)
      assert(r.getLong(2) === toks)
      assert(r.getLong(4) === nSeqs * 512 - toks)   // waste telescopes
      assert(r.getDouble(6) <= 1.0 && r.getDouble(6) > 0.0)
    }
  }
}
