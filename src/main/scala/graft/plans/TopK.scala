package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.LongType

/** Native per-key top-k — the engine's second whole-operator plan
  * (after [[AsOfJoinNode]]): `row_number() OVER (PARTITION BY keys
  * ORDER BY order) <= k`, executed as PARTIAL + FINAL like a hash
  * aggregation instead of Spark's window path.
  *
  * Why it matters at 100 TB: `WindowExec` ships EVERY row of every
  * group through the shuffle, buffers whole groups, ranks them, and
  * only then discards everything past k. The native pair prunes
  * map-side — each input partition keeps at most k rows per key in a
  * bounded heap, so the exchange moves ≤ (partitions × keys × k) rows
  * no matter how hot a key is (OSS Spark has no such rank pushdown;
  * the optimizer's `LimitPushDown` stops at global limits).
  * The FINAL stage then sorts only survivors and streams ranks out.
  */
case class TopKPerKeyNode(
    child: LogicalPlan,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference) extends UnaryNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  // rank originates here, not from the child
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKeyNode =
    copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(child, keys, order, k, rankAttr) =>
      FinalTopKExec(
        PartialTopKExec(planLater(child), keys, order, k),
        keys, order, k, rankAttr) :: Nil
    case _ => Nil
  }
}

/** Map-side pruning pass: per input partition, a hash map keyed by the
  * grouping values holds a bounded max-heap of the k best rows seen for
  * that key; everything else is dropped before the exchange. Memory is
  * min(rows, distinctKeys × k) row copies — the same residency class as
  * a partial hash aggregation. Against pathological key cardinality the
  * map is capped: past [[PartialTopKExec.MaxTrackedKeys]] distinct keys,
  * NEW keys pass rows through unpruned (correct — the FINAL stage
  * re-ranks; only the bandwidth saving degrades, exactly like a partial
  * agg that stops combining under memory pressure).
  */
case class PartialTopKExec(
    child: SparkPlan,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override lazy val metrics = Map(
    "prunedRows" -> SQLMetrics.createMetric(sparkContext, "rows pruned map-side"))

  override protected def withNewChildInternal(c: SparkPlan): PartialTopKExec =
    copy(child = c)

  override protected def doExecute(): RDD[InternalRow] = {
    val boundKeys = keys.map(BindReferences.bindReference(_, child.output))
    val boundOrder: Seq[SortOrder] =
      order.map(so => BindReferences.bindReference(so, child.output))
    val pruned = longMetric("prunedRows")
    val kk = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(boundKeys)
      // "best" = least under the requested sort; the heap keeps the k
      // least by dequeuing its max (PriorityQueue dequeues greatest)
      val rowOrd = RowOrdering.create(boundOrder, Seq.empty)
      val heaps = new java.util.HashMap[UnsafeRow,
        scala.collection.mutable.PriorityQueue[InternalRow]]()
      var overflow = List.empty[InternalRow]
      iter.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          if (heaps.size() >= PartialTopKExec.MaxTrackedKeys) {
            overflow ::= row.copy() // cap reached: pass through unpruned
          } else {
            heap = scala.collection.mutable.PriorityQueue.empty(rowOrd)
            heaps.put(key.copy(), heap)
            heap.enqueue(row.copy())
          }
        } else {
          if (heap.size < kk) heap.enqueue(row.copy())
          else if (rowOrd.compare(row, heap.head) < 0) {
            heap.dequeue(); pruned += 1
            heap.enqueue(row.copy())
          } else pruned += 1
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator) ++ overflow.iterator
    }, preservesPartitioning = true)
  }
}

object PartialTopKExec {
  val MaxTrackedKeys = 1 << 20
}

/** Streaming rank emitter over key-clustered, (keys, order)-sorted
  * input: one counter per key run, rows past k skipped. No group
  * buffering — working state is the previous key + a counter. */
case class FinalTopKExec(
    child: SparkPlan,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  private def asc(e: Expression): SortOrder =
    SortOrder(e, Ascending, Ascending.defaultNullOrdering, Seq.empty)

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(keys.map(asc) ++ order)

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def withNewChildInternal(c: SparkPlan): FinalTopKExec =
    copy(child = c)

  override protected def doExecute(): RDD[InternalRow] = {
    val boundKeys = keys.map(BindReferences.bindReference(_, child.output))
    val outAttrs = output
    val kk = k
    val numOutputRows = longMetric("numOutputRows")
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(boundKeys)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      var curKey: UnsafeRow = null
      var count = 0L
      iter.flatMap { row =>
        val key = keyProj(row)
        if (curKey == null || !curKey.equals(key)) {
          curKey = key.copy()
          count = 0L
        }
        count += 1
        if (count <= kk) {
          numOutputRows += 1
          rankRow.setLong(0, count)
          Some(resultProj(joined(row, rankRow)))
        } else None
      }
    }, preservesPartitioning = true)
  }
}

/** User-facing API for the native per-key top-k. */
object TopKOps {

  /** Distributed GLOBAL top-k with a rank column: the k-bounded
    * selection runs as TakeOrderedAndProject (per-partition bounded
    * heaps, one k-row driver merge — never a full-relation sort), then
    * the row_number window ranks the K survivors only. Drop-in
    * replacement for the `row_number().over(Window.orderBy(...))`
    * + `filter(rank <= k)` anti-pattern, whose unpartitioned window
    * sorts the whole relation on ONE task. The ordering must be total
    * (unique tiebreak) — same determinism contract as row_number. */
  def rankedTopK(df: DataFrame, order: Seq[Column], k: Int,
      rankCol: String = "rank"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.row_number
    df.orderBy(order: _*).limit(k)
      .withColumn(rankCol,
        row_number().over(Window.orderBy(order: _*)).cast("long"))
  }

  /** The k best rows per key under `order` (pass `col.desc`/`col.asc`
    * sort columns; bare columns default to ascending), with a `rank`
    * column (= row_number, 1-based). Make the ordering total — include
    * a unique tie-break column — or ties at the cut make row selection
    * nondeterministic, exactly as with `row_number()`. */
  def topKPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column],
      k: Int): DataFrame = {
    val spark = df.sparkSession
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(TopKStrategy))
      spark.experimental.extraStrategies = cur :+ TopKStrategy
    // route the sort columns through the ANALYZER (sortWithinPartitions
    // on the same analyzed child) so `.desc`/`.asc` Columns arrive as
    // fully-resolved catalyst SortOrders — the lazy Column→Expression
    // bridge would leave unevaluable wrapper nodes behind
    val sortOrders = df.sortWithinPartitions(order: _*)
      .queryExecution.analyzed
      .asInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Sort]
      .order
    Bridge.ofRows(spark,
      TopKPerKeyNode(
        df.queryExecution.analyzed,
        keys.map(Bridge.expr),
        sortOrders,
        k,
        AttributeReference("rank", LongType, nullable = false)()))
  }
}
