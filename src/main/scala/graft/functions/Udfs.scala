package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The user-extension surface (SURVEY.md §2.3 UDF/UDAF/UDTF row): a
  * registered scalar UDF, a typed `Aggregator` UDAF, and the Generator
  * path (explode — exercised by Q23).
  *
  * The reference hardcodes all logic in Java (no extension points); the
  * engine exposes the standard Spark extension surface instead. UDFs
  * here exist for SURFACE PARITY and tests — the query inventory itself
  * uses only codegen'd builtins/native expressions, because a Scala UDF
  * is an opaque box to Catalyst (no pushdown through it, no codegen).
  */
object Udfs {

  /** Price-string cleaner, the reference's `"$1,234.5"` → number parse
    * (`Double.parseDouble(s.replace("$",""))`,
    * MasterDataStreamGeneratorThread.java:46-49) — with the comma
    * handling the reference forgot. */
  val cleanPrice: String => Option[java.math.BigDecimal] = s =>
    Option(s).map(_.replaceAll("[$,]", "").trim).filter(_.nonEmpty)
      .flatMap(t => scala.util.Try(new java.math.BigDecimal(t)
        .setScale(4, java.math.RoundingMode.HALF_UP)).toOption)

  /** Register all engine UDFs on a session (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("graft_clean_price",
      (s: String) => cleanPrice(s).orNull)
  }

  /** Exact decimal-sum UDAF over a double column: the typed
    * `Aggregator[IN, BUF, OUT]` surface. Buffers in BigDecimal so the
    * result is order-independent like Canon.dsum. */
  object DecimalSum extends Aggregator[Double, java.math.BigDecimal, java.math.BigDecimal] {
    override def zero: java.math.BigDecimal = java.math.BigDecimal.ZERO
    override def reduce(b: java.math.BigDecimal, a: Double): java.math.BigDecimal =
      b.add(new java.math.BigDecimal(a).setScale(4, java.math.RoundingMode.HALF_UP))
    override def merge(b1: java.math.BigDecimal, b2: java.math.BigDecimal): java.math.BigDecimal =
      b1.add(b2)
    override def finish(r: java.math.BigDecimal): java.math.BigDecimal = r
    override def bufferEncoder: Encoder[java.math.BigDecimal] = Encoders.DECIMAL
    override def outputEncoder: Encoder[java.math.BigDecimal] = Encoders.DECIMAL
  }

  /** Column form of the decimal-sum UDAF. */
  def decimalSum(c: Column): Column = udaf(DecimalSum).apply(c)
}
