package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal, Murmur3Hash}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The catalog's V2 `bucket(n, col)` function — the contract that makes
  * STORAGE-PARTITIONED JOINS work end to end:
  *
  *  - the WRITER routes every row to `pmod(hash(col), n)` (Spark's
  *    `hash()` = Murmur3, seed 42) and lands it under a `_b=<id>` dir;
  *  - the SCAN reports `KeyGroupedPartitioning(bucket(n, col))`, which
  *    Catalyst resolves through this function (the
  *    `V2ExpressionUtils.loadV2FunctionOpt` path) into a
  *    `TransformExpression` whose `canonicalName` both join sides
  *    compare;
  *  - `produceResult` computes EXACTLY the writer's bucket id, so the
  *    `spark.sql.sources.v2.bucketing.shuffle.enabled` path (shuffling
  *    a non-bucketed side INTO this table's layout) and bucket-pruning
  *    of point predicates agree with the physical layout bit for bit.
  *
  * Same shape as Iceberg's `system.bucket` function; the hash is
  * Spark's own Murmur3 so the writer can stay a codegen'd column
  * expression (`pmod(hash(c), n)`) with no UDF in the commit path.
  */
object GraftBucketFunction extends UnboundFunction {

  /** Types the bucket transform accepts — the hash must be stable
    * across Spark versions AND reproducible from a plain literal for
    * bucket pruning, so keep to the primitive comparable key types. */
  private[sources] val supported: Set[DataType] =
    Set(IntegerType, LongType, StringType, DateType, ShortType, ByteType)

  override def name(): String = "bucket"

  override def description(): String =
    "bucket(n, col): pmod(murmur3_hash(col, seed=42), n) — the graft " +
      "bucketed-table layout function"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket takes (numBuckets, col), got ${inputType.simpleString}")
    val nType = inputType.fields(0).dataType
    require(nType == IntegerType,
      s"bucket count must be INT, got ${nType.catalogString}")
    val dt = inputType.fields(1).dataType
    require(supported.contains(dt),
      s"bucket column type ${dt.catalogString} is not supported " +
        s"(use one of ${supported.map(_.catalogString).mkString(", ")})")
    new GraftBucketBound(dt)
  }

  /** The bucket id of a plain JVM literal under the declared layout —
    * what the scan's bucket PRUNING uses to map a point predicate
    * (`WHERE k = 42`) to the single `_b=<id>` directory that can hold
    * it. Must agree with both `produceResult` and the writer column. */
  def bucketOf(value: Any, dt: DataType, numBuckets: Int): Int = {
    val h = Murmur3Hash(Seq(Literal.create(value, dt)), 42)
      .eval(InternalRow.empty).asInstanceOf[Int]
    java.lang.Math.floorMod(h, numBuckets)
  }
}

private[sources] class GraftBucketBound(dt: DataType)
  extends ScalarFunction[Integer] {

  override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def isResultNullable: Boolean = false

  /** Both join sides resolve their transform through their own catalog
    * instance; equality is by THIS string + numBuckets, so it must pin
    * everything the hash depends on (the input type changes Murmur3's
    * byte stream — int(5) and bigint(5) land in different buckets). */
  override def canonicalName(): String = s"graft.bucket(${dt.catalogString})"

  // interpreted Murmur3 over the value operand (field 1; field 0 is the
  // bucket count) — seed 42, identical to the SQL `hash()` the writer
  // uses, and null hashes to the seed on both paths
  private lazy val hashExpr =
    Murmur3Hash(Seq(BoundReference(1, dt, nullable = true)), 42)

  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    val h = hashExpr.eval(input).asInstanceOf[Int]
    Integer.valueOf(java.lang.Math.floorMod(h, n))
  }
}
