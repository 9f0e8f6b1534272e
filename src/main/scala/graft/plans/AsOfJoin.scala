package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** AS-OF JOIN as a first-class operator — the one relational primitive
  * in the inventory Spark genuinely lacks (SURVEY.md §2.B `q_join_asof`
  * emulates it with union + last-ignoreNulls window). Semantics: for
  * each left row, attach the right row of the same key with the
  * greatest time <= left time (left outer: nulls when none).
  *
  * Custom-operator tier (c) of the build contract: logical node +
  * planner strategy + physical exec registered via
  * `spark.experimental.extraStrategies` / GraftExtensions.
  *
  * Physical shape = sort-merge: EnsureRequirements co-partitions both
  * sides on the key (one shuffle each, same as any equi-join) and sorts
  * within partitions by (key, time); the merge walks both sorted
  * streams once — O(left + right) per partition, state = ONE buffered
  * right row. At 100 TB this behaves exactly like a sort-merge join:
  * no per-key buffering, no range-join row explosion, spillable sorts.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val resolved: Boolean = childrenResolved &&
    (leftKeys ++ rightKeys :+ leftTime :+ rightTime).forall(_.resolved)

  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    "as-of join key types must match")
  require(leftTime.dataType == rightTime.dataType,
    "as-of join time types must match")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  // rows are emitted in left order; partitioning is inherited
  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = leftKeys; val rk = rightKeys
    val lt = leftTime; val rt = rightTime
    val out = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // downstream operators (shuffle, collect) cast rows to UnsafeRow
      // — project the JoinedRow output like SortMergeJoinExec does
      val result = UnsafeProjection.create(out, out)
      new AsOfMergeIterator(lIter, rIter,
        UnsafeProjection.create(lk, lOut),
        UnsafeProjection.create(rk, rOut),
        UnsafeProjection.create(Seq(lt), lOut),
        UnsafeProjection.create(Seq(rt), rOut),
        RowOrdering.createNaturalAscendingOrdering(lk.map(_.dataType)),
        RowOrdering.createNaturalAscendingOrdering(Seq(lt.dataType)),
        rOut.size).map(result)
    }
  }
}

/** Single forward pass over two (key, time)-sorted streams. The only
  * retained state is the latest right row whose time <= the current
  * left time (`lastMatch`) plus a one-row lookahead — right rows are
  * copied exactly once when buffered.
  */
private[plans] class AsOfMergeIterator(
    lIter: Iterator[InternalRow], rIter: Iterator[InternalRow],
    lKeyProj: UnsafeProjection, rKeyProj: UnsafeProjection,
    lTimeProj: UnsafeProjection, rTimeProj: UnsafeProjection,
    keyOrd: Ordering[InternalRow], timeOrd: Ordering[InternalRow],
    rightWidth: Int) extends Iterator[InternalRow] {

  private val joined = new JoinedRow
  private val nullRight = new GenericInternalRow(rightWidth)
  private var rNext: InternalRow = nextRight()
  private var lastMatch: InternalRow = _

  /** Next right row with non-null key and time, copied (iterators
    * reuse row buffers); null at exhaustion.
    */
  private def nextRight(): InternalRow = {
    while (rIter.hasNext) {
      val r = rIter.next()
      if (!rKeyProj(r).anyNull && !rTimeProj(r).isNullAt(0)) return r.copy()
    }
    null
  }

  override def hasNext: Boolean = lIter.hasNext

  override def next(): InternalRow = {
    val l = lIter.next()
    val lKey = lKeyProj(l)
    if (lKey.anyNull || lTimeProj(l).isNullAt(0)) return joined(l, nullRight)
    // advance the right stream: drop keys already passed, absorb rows of
    // this key with time <= left time (left times ascend within a key,
    // so lastMatch stays valid across successive left rows)
    var advancing = true
    while (advancing && rNext != null) {
      val c = keyOrd.compare(rKeyProj(rNext), lKey)
      if (c < 0) rNext = nextRight()
      // distinct projection instances → distinct buffers; safe to compare
      else if (c == 0 &&
          timeOrd.compare(rTimeProj(rNext), lTimeProj(l)) <= 0) {
        lastMatch = rNext
        rNext = nextRight()
      } else advancing = false
    }
    if (lastMatch != null && keyOrd.compare(rKeyProj(lastMatch), lKey) == 0)
      joined(l, lastMatch)
    else joined(l, nullRight)
  }
}

/** Public API: `AsOf.join(left, right, ...)` — key/time columns are
  * referenced by name and must resolve unambiguously (rename clashing
  * columns on one side first, as with any join).
  */
object AsOf {
  def join(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    GraftPlanBridge.ofRows(spark, AsOfJoinPlan(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      leftKeys.map(UnresolvedAttribute(_)), rightKeys.map(UnresolvedAttribute(_)),
      UnresolvedAttribute(leftTime), UnresolvedAttribute(rightTime)))
  }
}
