package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Whole-operator Catalyst integration of the as-of join — the (c)
  * escalation tier: a custom LogicalPlan + SparkStrategy + SparkPlan
  * registered through SparkSessionExtensions, for the one time-series
  * operator Spark has no physical strategy for.
  *
  * Relationship to [[graft.ops.AsOfJoin.asof]] (the union+window
  * formulation, and the default): both are one-shuffle-per-side
  * plans, but the window formulation SORTS THE PROBE ROWS AND THE
  * REFERENCE ROWS TOGETHER (the union) and carries the payload
  * through a window buffer, while this exec sorts each side
  * independently and streams them through a merge with O(1) state —
  * one candidate row — per partition. At 100 TB that means the
  * reference side never rides inside the probe side's sort, and the
  * per-partition memory is a single row regardless of key skew.
  * Differential specs (AsOfExecSpec, OpsPropertySpec) pin the two
  * formulations row-identical; query x18 oracle-checks the exec
  * against DuckDB's native ASOF JOIN.
  *
  * Semantics (identical to [[graft.ops.AsOfJoin.asof]]):
  * per key, each left row takes the right row with the greatest
  * right time <= left time; co-timed right rows match; ties among
  * co-timed right rows resolve to the largest payload tuple (enforced
  * by the required right-side ordering, not by arrival order); null
  * keys and null times never match on either side; left-outer.
  *
  * The time columns must be LongType — the engine's canonical epoch
  * ns/µs ([[graft.ops.EventTime]]). That keeps the merge comparison a
  * primitive compare and sidesteps cross-encoding drift by
  * construction.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    payload: Seq[Attribute]) extends BinaryNode {
  require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
    "as-of join needs matching non-empty key lists")
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    // the merge compares the two sides' key projections with ONE
    // generated ordering — differently-typed keys would compare
    // unrelated bytes, not values
    s"as-of key types differ between sides: " +
      s"${leftKeys.map(_.dataType.simpleString).mkString(",")} vs " +
      s"${rightKeys.map(_.dataType.simpleString).mkString(",")}")
  require(leftTime.dataType == LongType && rightTime.dataType == LongType,
    "as-of exec requires LongType (canonical epoch) time columns")

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: maps the logical node onto [[AsOfJoinExec]].
  * Injected by [[graft.functions.GraftExtensions]] via
  * `injectPlannerStrategy` — the standard plugin seam, so any session
  * built with the extensions plans the node with no engine forks.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, payload) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, payload) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of physical operator.
  *
  * Required layout: both children hash-clustered on their keys
  * (EnsureRequirements co-partitions them, exactly as for a
  * sort-merge join) and sorted by (keys..., time[, payload...]) —
  * the payload tail on the RIGHT ordering makes the co-timed-tie pick
  * (last consumed = largest payload) deterministic without buffering.
  *
  * Merge state per partition: one candidate row. A right row is
  * consumed when its (key, time) is <= the current left row's; rows
  * with a smaller key are discarded permanently (left keys only grow
  * in sorted order), rows with the equal key become the candidate.
  * Interpreted row-at-a-time (no codegen) — the right altitude for a
  * first physical operator; the hot loop is primitive compares plus
  * two unsafe projections.
  */
case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    payload: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)),
    (rightKeys ++ (rightTime +: payload.filterNot(p =>
      rightKeys.contains(p) || p == rightTime)))
      .map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeysB = leftKeys
    val rKeysB = rightKeys
    val lTimeB = leftTime
    val rTimeB = rightTime
    val payloadB = payload
    val keySchema = StructType(leftKeys.map(a =>
      StructField(a.name, a.dataType, nullable = true)))
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeysB, lOut)
      val rKeyProj = UnsafeProjection.create(rKeysB, rOut)
      val lTimeBound = BindReferences.bindReference(lTimeB: Expression, lOut)
      val rTimeBound = BindReferences.bindReference(rTimeB: Expression, rOut)
      val payloadProj = UnsafeProjection.create(payloadB, rOut)
      // bind the result against NULLABLE payload attrs: the unmatched
      // branch feeds an all-null row, and a nullable=false binding
      // would skip the null check and read garbage zeros
      val resultProj = UnsafeProjection.create(output,
        lOut ++ payloadB.map(_.withNullability(true)))
      val keyOrd = GenerateOrdering.create(keySchema)
      val nullPayload = new GenericInternalRow(payloadB.length)
      val joined = new JoinedRow
      val rBuf = rIter.buffered

      var candKey: UnsafeRow = null
      var candPayload: UnsafeRow = null

      lIter.map { l =>
        val lk = lKeyProj(l)
        val ltRaw = lTimeBound.eval(l)
        val lKeyValid = !lk.anyNull && ltRaw != null
        if (lKeyValid) {
          val lt = ltRaw.asInstanceOf[Long]
          var advance = true
          while (advance && rBuf.hasNext) {
            val rHead = rBuf.head
            val rk = rKeyProj(rHead)
            val rtRaw = rTimeBound.eval(rHead)
            if (rk.anyNull || rtRaw == null) {
              // SQL equality/inequality with null never matches: the
              // row can never be a candidate for ANY left row — drop
              rBuf.next()
            } else {
              val cmp = keyOrd.compare(rk, lk)
              if (cmp < 0) {
                // keys only grow on the sorted left side: permanently dead
                rBuf.next()
              } else if (cmp == 0 && rtRaw.asInstanceOf[Long] <= lt) {
                rBuf.next()
                candKey = rk.copy()
                candPayload = payloadProj(rHead).copy()
              } else {
                advance = false
              }
            }
          }
        }
        val matched = lKeyValid && candKey != null && keyOrd.compare(candKey, lk) == 0
        resultProj(joined(l, if (matched) candPayload else nullPayload))
      }
    }
  }
}
