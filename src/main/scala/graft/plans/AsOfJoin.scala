package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.graftbridge.Bridge

/** Native as-of join — the whole-operator custom-plan tier (SURVEY.md
  * §2.3 "custom operators" path (c)): logical node + planner strategy +
  * physical operator, registered per-session via
  * [[AsOfOps.asofJoin]] / [[GraftExtensions]].
  *
  * Semantics: inner as-of — for each left row, the single right row
  * with the same key and the greatest `rightTime <= leftTime`
  * (ties broken by the greatest `rightTieBreak`); `forward = true`
  * flips the direction to the smallest `rightTime >= leftTime`
  * (smallest tie-break), the "next state change" lookup. Matches the composed
  * formulation (join + per-event window, q19) row-for-row, but executes
  * as ONE pass: both sides shuffle once on the key, sort within
  * partitions, and a streaming per-partition merge keeps only a
  * one-row candidate per key — the O(matches) intermediate of the
  * composed plan (every order at-or-before every event, then a second
  * shuffle on event_id to rank them) never materializes. At 100 TB
  * that intermediate is the product of key frequency × history depth;
  * the merge's working set is one row.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Seq[Expression],
    isOuter: Boolean,
    forward: Boolean) extends BinaryNode {

  override def output: Seq[Attribute] =
    if (isOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] as [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, tb, outer, fwd) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb, outer, fwd) :: Nil
    case _ => Nil
  }
}

/** Sorted-merge as-of join executor.
  *
  * Child requirements do all the heavy lifting declaratively — Spark's
  * `EnsureRequirements` inserts the hash exchanges and in-partition
  * sorts (and AQE still re-plans them), so the operator itself is only
  * the linear merge:
  *  - both children clustered on their key (co-partitioned exchange);
  *  - left ordered by (key, time), right by (key, time, tieBreak…);
  *  - per partition, walk left once while a single right cursor only
  *    ever advances; the last right row seen with `rTime <= lTime`
  *    under the current key is the match (sort order makes it the
  *    greatest (time, tieBreak) — exactly the composed window's
  *    `row_number() = 1` pick).
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Seq[Expression],
    isOuter: Boolean,
    forward: Boolean) extends BinaryExecNode {

  require(leftKey.dataType == rightKey.dataType,
    s"as-of join key types differ: ${leftKey.dataType} vs ${rightKey.dataType}")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of join time types differ: ${leftTime.dataType} vs ${rightTime.dataType}")

  override def output: Seq[Attribute] =
    if (isOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  // SQL-UI observability, like every built-in join operator
  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatchedRows" -> SQLMetrics.createMetric(sparkContext, "number of matched left rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  private def asc(e: Expression): SortOrder =
    SortOrder(e, Ascending, Ascending.defaultNullOrdering, Seq.empty)

  // both directions sort ascending: backward keeps the LAST right row
  // <= t (greatest time/tie-break reached last), forward stops at the
  // FIRST right row >= t (smallest time/tie-break reached first)
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(asc(leftKey), asc(leftTime)),
    Seq(asc(rightKey), asc(rightTime)) ++ rightTieBreak.map(asc))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTime, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTime, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val outAttrs = output

    val outer = isOuter
    val fwd = forward
    val rightArity = right.output.size
    val numOutputRows = longMetric("numOutputRows")
    val numMatchedRows = longMetric("numMatchedRows")

    left.execute().zipPartitions(right.execute(), preservesPartitioning = true) {
      (lIter, rIter) =>
        val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
        val joined = new JoinedRow
        val nullRight = new GenericInternalRow(rightArity)
        new Iterator[InternalRow] {
          // one-row lookahead on the right; shuffle rows are reused
          // buffers, so the candidate must be a copy
          private var rNext: InternalRow = if (rIter.hasNext) rIter.next() else null
          private var candidate: InternalRow = null
          private var candidateKey: Any = null
          private var pending: InternalRow = null

          private def advanceRight(): Unit =
            rNext = if (rIter.hasNext) rIter.next() else null

          private def computeNext(): InternalRow = {
            while (lIter.hasNext) {
              val l = lIter.next()
              val k = lk.eval(l)
              val t = lt.eval(l)
              if (k != null && t != null) {
                var done = false
                while (!done && rNext != null) {
                  val rkv = rk.eval(rNext)
                  val rtv = rt.eval(rNext)
                  if (rkv == null || rtv == null) advanceRight()
                  else {
                    val c = keyOrd.compare(rkv, k)
                    if (c < 0) advanceRight()
                    else if (!fwd && c == 0 && timeOrd.compare(rtv, t) <= 0) {
                      candidate = rNext.copy()
                      candidateKey = rk.eval(candidate)
                      advanceRight()
                    } else if (fwd && c == 0 && timeOrd.compare(rtv, t) < 0) {
                      advanceRight() // forward: rights before t can never match
                    } else done = true
                  }
                }
                if (fwd) {
                  // forward match = the row the cursor stopped on, iff same
                  // key; do NOT advance — it may match later lefts too
                  if (rNext != null && {
                      val rkv = rk.eval(rNext); rkv != null &&
                        keyOrd.compare(rkv, k) == 0 }) {
                    numMatchedRows += 1; numOutputRows += 1
                    return resultProj(joined(l, rNext))
                  } else if (outer) {
                    numOutputRows += 1
                    return resultProj(joined(l, nullRight))
                  }
                } else {
                  // a candidate left over from an earlier key never matches
                  // again (keys ascend) — the equality check retires it
                  if (candidate != null && keyOrd.compare(candidateKey, k) == 0) {
                    numMatchedRows += 1; numOutputRows += 1
                    return resultProj(joined(l, candidate))
                  } else if (outer) {
                    numOutputRows += 1
                    return resultProj(joined(l, nullRight))
                  }
                }
              } else if (outer) {
                numOutputRows += 1
                return resultProj(joined(l, nullRight))
              }
            }
            null
          }

          override def hasNext: Boolean = {
            if (pending == null) pending = computeNext()
            pending != null
          }

          override def next(): InternalRow = {
            if (!hasNext) throw new NoSuchElementException
            val r = pending
            pending = null
            r
          }
        }
    }
  }
}

/** User-facing API for the native as-of join. */
object AsOfOps {

  /** As-of join: each left row paired with the latest right row of the
    * same key at-or-before its time (greatest `rightTieBreak` on time
    * ties). Inner by default; `outer = true` keeps unmatched left rows
    * with a null-filled right side (the pandas-style merge_asof
    * default); `forward = true` matches the EARLIEST right row
    * at-or-after instead (smallest tie-break). Pass resolved columns
    * (`df("c")`). */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      rightTieBreak: Seq[Column] = Nil,
      outer: Boolean = false,
      forward: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
    Bridge.ofRows(spark,
      AsOfJoinNode(
        left.queryExecution.analyzed, right.queryExecution.analyzed,
        Bridge.expr(leftKey), Bridge.expr(rightKey),
        Bridge.expr(leftTime), Bridge.expr(rightTime),
        rightTieBreak.map(Bridge.expr), outer, forward))
  }
}
