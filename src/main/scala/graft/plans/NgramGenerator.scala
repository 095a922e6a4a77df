package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native table-valued function (Catalyst `Generator`): stream the
  * sliding n-grams of a token array as (pos, ngram) rows.
  *
  * This is the generator analog of the [[DotProduct]] story. The
  * composed formulation —
  * `posexplode(transform(sequence(...), i -> array_join(slice(toks, i, n), ' ')))`
  * — **materializes the complete n-gram array per row** before the
  * `Generate` node fans it out: for a 10 k-token document that is an
  * extra ~10 k-element array of freshly concatenated strings held in
  * memory per input row, purely as plumbing. A `Generator` is Spark's
  * actual contract for one-row→many-rows: `eval` returns an iterator
  * the `GenerateExec` consumer drains row-by-row, so peak memory per
  * input row is ONE output row regardless of document length, and each
  * n-gram string is built exactly once with a zero-copy
  * `UTF8String.concatWs` over the array slice (the composed form
  * decodes/re-encodes each token through `slice` + `array_join`).
  *
  * Registered as SQL function `graft_ngrams(tokens, n)` (see
  * [[GraftRules.sqlFunctions]]), usable in `SELECT`/`LATERAL VIEW`
  * like any built-in generator. Positions are 1-based to match SQL
  * `generate_series` conventions; a document shorter than `n` tokens
  * yields no rows; a NULL array yields no rows (explode semantics).
  *
  * Scale note (100 TB): generators run inside `GenerateExec` on the
  * scan side — no shuffle is introduced, the fan-out is pipelined into
  * whatever consumes it (typically a partial aggregate), and because
  * the iterator is lazy a downstream `LIMIT` stops n-gram production
  * mid-document. `CodegenFallback` here costs one virtual call per
  * OUTPUT row, not per token; the dominant work (UTF8 concat) is
  * identical under codegen.
  */
case class NgramGen(tokens: Expression, n: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(tokens, n)

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = tokens.dataType match {
    case ArrayType(StringType, _) =>
      if (n.foldable && n.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"n must be a foldable INT, got ${n.sql}")
    case other => TypeCheckResult.TypeCheckFailure(
      s"tokens must be ARRAY<STRING>, got ${other.simpleString}")
  }

  private lazy val nVal: Int = n.eval(null).asInstanceOf[Int]
  private lazy val space = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = tokens.eval(input).asInstanceOf[ArrayData]
    if (arr == null || nVal <= 0 || arr.numElements() < nVal) Iterator.empty
    else {
      val len = arr.numElements()
      val window = new Array[UTF8String](nVal)
      (0 to len - nVal).iterator.map { i =>
        var j = 0
        while (j < nVal) { window(j) = arr.getUTF8String(i + j); j += 1 }
        InternalRow(i + 1, UTF8String.concatWs(space, window: _*))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): NgramGen =
    copy(tokens = newChildren(0), n = newChildren(1))

  override def prettyName: String = "graft_ngrams"
}
