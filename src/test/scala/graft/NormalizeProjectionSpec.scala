package graft

import org.apache.spark.sql.functions._

import graft.functions.{SimilarityOps, TextOps}
import graft.plans.TextNormalize.nfcNative

/** q239 (Unicode normalization battery + the native NfcNormalize
  * expression) and q240 (Johnson–Lindenstrauss ±1 random projection):
  * ground-truth parity with the JDK normalizer, residue accounting per
  * planted dirt class, bit-parity of the projection with a driver
  * reference, and the JL distortion/recall bounds the 16-dim sketch
  * must hold to be useful as a candidate-generation prefilter.
  */
class NormalizeProjectionSpec extends SparkTestBase {
  import spark.implicits._

  test("NfcNormalize (codegen path) matches java.text.Normalizer NFC") {
    val cases = Seq(
      "Cafe\u0301",        // decomposed acute -> composed e-acute
      "\u2126 ohm",            // OHM SIGN -> GREEK OMEGA singleton
      "\u212B angstrom",       // ANGSTROM SIGN -> Å
      "already clean ASCII",
      "q\u0307\u0323 marks", // combining marks canonical-reorder
      "\uD83D\uDE00 astral",   // surrogate pair survives untouched
      "")
    val out = cases.toDF("s")
      .select(col("s"), nfcNative(col("s")).as("n"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { c =>
      assert(out(c) ===
        java.text.Normalizer.normalize(c, java.text.Normalizer.Form.NFC),
        s"NFC mismatch for ${c.map(_.toInt.toHexString).mkString(",")}")
    }
  }

  test("NfcNormalize: null in null out; non-string input refuses analysis") {
    val r = Seq((1, null: String)).toDF("i", "s")
      .select(nfcNative(col("s"))).head()
    assert(r.isNullAt(0))
    val err = intercept[Exception] {
      Seq(1).toDF("i").select(nfcNative(col("i"))).collect()
    }
    def msgs(e: Throwable): String =
      if (e == null) "" else Option(e.getMessage).getOrElse("") + msgs(e.getCause)
    assert(msgs(err).contains("nfc_normalize expects string"))
  }

  test("q239: every dirt class cleans with the expected accounting, " +
    "zero residue") {
    val rows = TextOps.q239.build(spark, sf).collect()
    assert(rows.length === Tables.documents(spark, sf).count())
    val residue = "\u200B\u200C\u200D\uFEFF\u00A0\u2018\u2019\u201C\u201D" +
      "\u2013\u2014\t\r\n"
    rows.foreach { r =>
      val id = r.getLong(0)
      val clean = r.getString(4)
      assert(!clean.exists(residue.contains(_)),
        s"doc $id keeps residue: ${clean.filter(residue.contains(_))}")
      assert(!clean.contains("  "), s"doc $id keeps a whitespace run")
      assert(r.getLong(3) === clean.length.toLong)
      (id % 5).toInt match {
        case 0 => // decomposed é + typography: NFC composes
          assert(r.getBoolean(1) && r.getLong(2) === 0L)
          assert(clean.contains("Caf\u00E9") && clean.contains("- \"q\""))
        case 1 => // zero-width pair: NFC no-op, strip removes exactly 2
          assert(!r.getBoolean(1) && r.getLong(2) === 2L)
          assert(clean.contains("xyz"))
        case 2 => // NBSP/TAB/CRLF: all collapse to single spaces
          assert(!r.getBoolean(1) && r.getLong(2) === 0L)
          assert(clean.contains("A B C D"))
        case 3 => // NFC singletons: OHM -> Ω, ANGSTROM -> Å
          assert(r.getBoolean(1) && r.getLong(2) === 0L)
          assert(clean.contains("\u03A9 and \u00C5"))
        case _ => // C0 control: NFC no-op, strip removes exactly 1
          assert(!r.getBoolean(1) && r.getLong(2) === 1L)
          assert(clean.contains("plain"))
      }
    }
  }

  test("q240: projection is bit-equal to the driver reference; the " +
    "16-dim sketch holds JL distortion and prefilter recall") {
    val emb = Tables.embeddings(spark, sf).orderBy("vec_id")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val ids = emb.map(_._1)
    val e = emb.map(_._2.map(_.toDouble))
    val n = e.length
    val signs = Array.tabulate(16, 64)((j0, i0) =>
      SimilarityOps.rpSign(i0 + 1, j0 + 1).toDouble)
    val ref = e.map(v => signs.map(s => {
      var acc = 0.0; var i = 0
      while (i < 64) { acc += v(i) * s(i); i += 1 }
      acc
    }))
    val got = SimilarityOps.q240.build(spark, sf).collect()
    assert(got.length === n * 16)
    val idx = ids.zipWithIndex.toMap
    got.foreach { r =>
      val (a, j, p) = (idx(r.getLong(0)), r.getInt(1) - 1, r.getDouble(2))
      assert(p === ref(a)(j), s"proj mismatch vec=${r.getLong(0)} j=${j + 1}")
    }
    // JL distortion on a deterministic pair sample: the 16-dim estimate
    // ||P(a)-P(b)||^2/16 of ||a-b||^2 — measured 0.246 median / 0.285
    // mean on this fixture (theory ~ sqrt(2/k) = 0.35 std for k=16).
    // The quadratic sign formula matters: the affine variant's shifted
    // (correlated) rows measured 0.52 median on the same pairs.
    def d2(x: Array[Double], y: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < x.length) { val t = x(i) - y(i); acc += t * t; i += 1 }
      acc
    }
    val errs = (0 until n).flatMap { a =>
      val b = (a * 7 + 13) % n
      if (a == b) None
      else {
        val ex = d2(e(a), e(b))
        if (ex <= 0) None
        else Some(math.abs(d2(ref(a), ref(b)) / 16.0 - ex) / ex)
      }
    }.sorted
    assert(errs(errs.length / 2) < 0.33,
      s"median JL distortion ${errs(errs.length / 2)}")
    assert(errs.sum / errs.length < 0.38,
      s"mean JL distortion ${errs.sum / errs.length}")
    // prefilter recall: the exact cosine top-1 appears in the sketch's
    // top-50 candidates (measured 0.622 on this noise-level fixture —
    // the same worst-case regime q31b's LSH gate documents)
    def cosTop(v: Array[Array[Double]], a: Int, k: Int): Seq[Int] = {
      val na = math.sqrt(v(a).map(x => x * x).sum)
      (0 until n).filter(_ != a).map { b =>
        val nb = math.sqrt(v(b).map(x => x * x).sum)
        var acc = 0.0; var i = 0
        while (i < v(a).length) { acc += v(a)(i) * v(b)(i); i += 1 }
        b -> acc / (na * nb)
      }.sortBy { case (b, s) => (-s, b) }.take(k).map(_._1)
    }
    val hits = (0 until n).count { a =>
      cosTop(ref, a, 50).contains(cosTop(e, a, 1).head)
    }
    assert(hits.toDouble / n > 0.5, s"prefilter recall@50 ${hits.toDouble / n}")
  }
}
