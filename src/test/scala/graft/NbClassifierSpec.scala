package graft

/** q234's hash gate proves train+inference match DuckDB exactly; this
  * spec gates the part a hash can't — that the model actually LEARNED:
  * held-out accuracy must clear the majority-class prior by a wide
  * margin, i.e. the classifier recovers the labeling rule through the
  * 64-bucket hash rather than parroting the prior. */
class NbClassifierSpec extends SparkTestBase {

  test("held-out accuracy beats the class prior by a wide margin") {
    val out = graft.functions.TextOps.q234.build(spark, sf).collect()
    val n = out.length
    assert(n > 50, s"held-out split unexpectedly small: $n")
    val acc = out.count(_.getAs[Long]("correct") == 1).toDouble / n
    val p = out.count(_.getAs[Long]("gold") == 1).toDouble / n
    val prior = math.max(p, 1 - p)
    assert(acc >= 0.75, f"held-out accuracy $acc%.3f under 0.75")
    assert(acc >= prior + 0.1,
      f"accuracy $acc%.3f does not clear the prior $prior%.3f")
  }

  test("prediction is the sign of the emitted score — the model is " +
    "deployable from its output alone") {
    val out = graft.functions.TextOps.q234.build(spark, sf).collect()
    out.foreach { r =>
      val pred = r.getAs[Long]("pred")
      val score = r.getAs[Double]("score")
      assert((score >= 0) == (pred == 1L),
        s"doc ${r.getAs[Long]("doc_id")}: score $score vs pred $pred")
    }
  }
}
