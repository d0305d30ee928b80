package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.SparkStrategy

/** Custom whole-operator path (SURVEY.md §2 X: LogicalPlan + Strategy +
  * SparkPlan) — the as-of join as a first-class physical operator, the
  * way the reference engine would add an exec node
  * (apache-impala-4.1.0/be/src/exec/ join-node shape): declare the
  * distribution/ordering the operator needs (cluster by key, sort by
  * (key, ts)), let the planner insert exchanges, then do a single
  * merge pass per partition. One shuffle per side, zero extra
  * materialization — the MPP formulation of the same semantics as
  * graft.operators.AsOfJoin.asof (the union+window composition), which
  * doubles as its differential test.
  *
  * Keys and timestamps are LongType (the pipeline's normalized form).
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, leftTs: Expression,
                        rightKey: Expression, rightTs: Expression,
                        rightPayload: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ rightPayload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, lts, rk, rts, payload) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lts, rk, rts, payload) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, leftTs: Expression,
                        rightKey: Expression, rightTs: Expression,
                        rightPayload: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ rightPayload.map(_.withNullability(true))

  // Planner contract: both sides hash-clustered on the key and sorted by
  // (key, ts) — EnsureRequirements inserts the exchanges/sorts, AQE can
  // still re-plan them.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending) :: SortOrder(leftTs, Ascending) :: Nil,
      SortOrder(rightKey, Ascending) :: SortOrder(rightTs, Ascending) :: Nil)
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    SortOrder(leftKey, Ascending) :: SortOrder(leftTs, Ascending) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lts = BindReferences.bindReference(leftTs, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rts = BindReferences.bindReference(rightTs, right.output)
    val payloadExprs = rightPayload.map(a => BindReferences.bindReference(a: Expression, right.output))
    val numPayload = rightPayload.length
    // project against `output` (payload nullability forced true): binding
    // the original non-nullable payload attrs would skip null checks and
    // read the null-filler row as 0 instead of NULL
    val outSchema = output

    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val payloadProj = UnsafeProjection.create(payloadExprs)
      val resultProj = UnsafeProjection.create(outSchema, outSchema)
      val joined = new JoinedRow
      val nulls = new GenericInternalRow(numPayload)
      // Right side pre-mapped to (key, ts, copied payload): iterator rows
      // are reused buffers, so the payload must be copied when buffered.
      // NULL-key/ts right rows can never match (SQL join-on-NULL
      // semantics) and would break the ascending-key merge invariant
      // (NULLs sort first but eval to null, not a long) — drop them.
      val rIter = ri.flatMap { r =>
        val k = rk.eval(r); val t = rts.eval(r)
        if (k == null || t == null) Nil
        else (k.asInstanceOf[Long], t.asInstanceOf[Long], payloadProj(r).copy()) :: Nil
      }.buffered
      var lastKey = 0L
      var lastRow: InternalRow = null
      var haveLast = false
      li.map { l =>
        val kAny = lk.eval(l); val tAny = lts.eval(l)
        if (kAny == null || tAny == null) {
          // NULL-key left rows are kept (LEFT as-of) with NULL payload
          resultProj(joined(l, nulls))
        } else {
          val k = kAny.asInstanceOf[Long]
          val t = tAny.asInstanceOf[Long]
          while (rIter.hasNext &&
            (rIter.head._1 < k || (rIter.head._1 == k && rIter.head._2 <= t))) {
            val h = rIter.next()
            lastKey = h._1; lastRow = h._3; haveLast = true
          }
          val payload = if (haveLast && lastKey == k) lastRow else nulls
          resultProj(joined(l, payload))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
