package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode NFC normalization.
  *
  * Spark ships no normalization function, yet it is the FIRST pass of
  * every text-pipeline cleanup (decomposed accents, compatibility
  * singletons like U+2126 OHM SIGN, and mojibake repair all start from
  * a canonical form — otherwise "Café" hashes two ways and dedup /
  * token counting silently fracture). A Scala UDF would work but drops
  * the row out of WholeStageCodegen and pays closure dispatch per row;
  * this expression stays codegen'd like the rest of the cleanup battery
  * (regexp_replace / translate), so the whole normalize→strip→unify
  * pipeline is one generated loop.
  *
  * Semantics: `java.text.Normalizer.normalize(s, NFC)` — the normative
  * UAX#15 canonical composition, which is what the DuckDB oracle's
  * `nfc_normalize` implements too (both are ICU-conformant; the gate
  * sticks to stability-guaranteed compositions). Null in → null out.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nfc_normalize expects string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // Fast path: Normalizer.isNormalized is a cheap scan; ASCII and
    // already-composed text (the overwhelming majority of a real
    // corpus) skips the rewrite allocation entirely.
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
      input
    else
      UTF8String.fromString(
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      s"""
         |java.lang.String $s = $c.toString();
         |if (java.text.Normalizer.isNormalized($s,
         |    java.text.Normalizer.Form.NFC)) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($s,
         |      java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object TextNormalize {
  /** Column-level wrapper: codegen'd Unicode NFC normalization. */
  def nfcNative(c: Column): Column =
    GraftColumnBridge.column(NfcNormalize(GraftColumnBridge.expression(c)))
}
