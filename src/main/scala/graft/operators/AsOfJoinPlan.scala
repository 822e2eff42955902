package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.ColumnBridge

/** The full custom-operator stack for the backward as-of join:
  * logical node → planner strategy → physical merge. Spark's
  * EnsureRequirements supplies the Exchange (hash on the key) and the
  * (key, time) Sort on both sides from the declared requirements —
  * exactly the shape a SortMergeJoin gets — and the physical operator
  * is then a single O(|L|+|R|) streaming pass per partition that
  * carries the last right row at-or-before the current left time.
  *
  * Compared to the union-tag composition (AsOfJoin.backward) this
  * avoids unioning the inputs into one wide schema and keeps each
  * side's shuffle independent; compared to join+rank it never
  * materializes per-key histories.
  */
final case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                              leftKey: Expression, rightKey: Expression,
                              leftTime: Expression, rightTime: Expression)
  extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                              leftKey: Expression, rightKey: Expression,
                              leftTime: Expression, rightTime: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Both sides hash-cluster on their key (co-partitioned like a
    * sort-merge join) …
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  /** … and arrive sorted by (key, time), so the merge is one pass. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val nRight = right.output.size

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow
      // downstream operators (Exchange, codegen inputs) expect UnsafeRow
      val toUnsafe = UnsafeProjection.create(output, output)
      val rBuf = rIt.buffered
      var heldKey: Any = null
      var held: InternalRow = null // last right row consumed for heldKey

      lIt.map { lRow =>
        val k = lKey.eval(lRow)
        val t = lTime.eval(lRow)
        // drop state from earlier keys
        if (held != null && keyOrd.compare(heldKey.asInstanceOf[AnyRef],
          k.asInstanceOf[AnyRef]) != 0) {
          held = null; heldKey = null
        }
        // advance the right side to the last row with
        // rKey < k, or rKey == k && rTime <= t
        var advancing = true
        while (advancing && rBuf.hasNext) {
          val peek = rBuf.head
          val pk = rKey.eval(peek)
          val cmp = keyOrd.compare(pk.asInstanceOf[AnyRef],
            k.asInstanceOf[AnyRef])
          if (cmp < 0) {
            rBuf.next() // other key's past: consume, don't hold
          } else if (cmp == 0 && timeOrd.compare(
            rTime.eval(peek).asInstanceOf[AnyRef],
            t.asInstanceOf[AnyRef]) <= 0) {
            held = rBuf.next().copy(); heldKey = pk
          } else {
            advancing = false
          }
        }
        val matched = held != null && keyOrd.compare(
          heldKey.asInstanceOf[AnyRef], k.asInstanceOf[AnyRef]) == 0
        toUnsafe(joined(lRow, if (matched) held else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinPlan {
  /** Native as-of join between two DataFrames (columns by name). Also
    * registers the planner strategy on the session (idempotent).
    */
  def backward(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String): DataFrame = {
    val spark: SparkSession = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in ${p.output.map(_.name).mkString(",")}"))
    ColumnBridge.ofRows(spark, AsOfJoinPlan(lPlan, rPlan,
      attr(lPlan, leftKey), attr(rPlan, rightKey),
      attr(lPlan, leftTime), attr(rPlan, rightTime)))
  }
}
