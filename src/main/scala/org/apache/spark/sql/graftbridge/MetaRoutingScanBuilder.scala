package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType

/** Routes a graft table's PLAIN scan between Spark's own
  * `ParquetScanBuilder` (the common, fully-vectorized path) and a
  * meta-capable fallback when the query references the table's
  * `_gfile`/`_gpos` metadata columns — which the stock parquet builder
  * cannot serve (it would silently null-fill them through schema
  * clipping).
  *
  * Lives under `org.apache.spark.sql` because the file-source builders
  * push filters through the `private[sql]`
  * [[SupportsPushDownCatalystFilters]] trait; delegating it verbatim
  * keeps partition pruning and parquet row-group pushdown intact on the
  * common path. When the fallback engages, the builder hands the
  * fallback EVERY catalyst conjunct it saw — the plain builder consumed
  * partition filters as non-residual, so a swapped scan must re-apply
  * them itself or partition predicates would be lost. */
class MetaRoutingScanBuilder(
    plain: ScanBuilder,
    metaNames: Set[String],
    metaScan: (StructType, Seq[Expression]) => Scan)
  extends ScanBuilder
  with SupportsPushDownCatalystFilters
  with SupportsPushDownRequiredColumns {

  private var all: Seq[Expression] = Nil
  private var metaRequired: Option[StructType] = None

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    all = filters
    plain match {
      case f: SupportsPushDownCatalystFilters => f.pushFilters(filters)
      case _ => filters
    }
  }

  override def pushedFilters: Array[Predicate] =
    if (metaRequired.isDefined) Array.empty
    else plain match {
      case f: SupportsPushDownCatalystFilters => f.pushedFilters
      case _ => Array.empty
    }

  override def pruneColumns(requiredSchema: StructType): Unit =
    if (requiredSchema.fieldNames.exists(metaNames.contains))
      metaRequired = Some(requiredSchema)
    else plain match {
      case p: SupportsPushDownRequiredColumns =>
        p.pruneColumns(requiredSchema)
      case _ =>
    }

  override def build(): Scan = metaRequired match {
    case Some(req) => metaScan(req, all)
    case None => plain.build()
  }
}
