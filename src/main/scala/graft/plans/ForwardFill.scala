package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.ColumnBridge

/** FORWARD FILL as a first-class physical operator — the §2.14(c)
  * altitude of the custom-operator preference order: a custom
  * `LogicalPlan` + `SparkStrategy` + `SparkPlan`, not an expression and
  * not a `Window`.
  *
  * Semantics: within each partition-key group, ordered by `order`, emit
  * every input row plus the LAST non-null value of `fill` seen so far
  * (null until the first non-null). This is the reference's PCR
  * bucket-inherit semantic (`ts_enc.c:203-205`: packets carry the clock
  * of the latest PCR before them) generalized.
  *
  * Why an operator instead of `last(_, ignoreNulls).over(window)`: the
  * window form materializes a `WindowExec` buffer per group and (for an
  * unpartitioned timeline) collapses to a single task. This exec node
  * declares `requiredChildDistribution` + `requiredChildOrdering`, so
  * EnsureRequirements plans exactly one hash exchange + sort, and the
  * fill itself is a ONE-PASS iterator with O(1) state per group — no
  * row buffering at all. On a 100 TB timeline the cost is the sort;
  * the fill is free.
  *
  * Equality against the window path and the two-pass slice fill
  * (`Remux.cbrPlanStreams`) is spec-pinned; the driver-facing query
  * `ts18_fill_forward` hash-matches DuckDB's `last_value IGNORE NULLS`
  * re-derivation.
  */
case class ForwardFillPlan(
    partKeys: Seq[Expression],
    order: Expression,
    fill: Expression,
    outAttr: AttributeReference,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ outAttr
  override def producedAttributes: AttributeSet = AttributeSet(outAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan)
      : ForwardFillPlan = copy(child = newChild)
}

object ForwardFillStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case ForwardFillPlan(pk, ord, fill, out, child) =>
      ForwardFillExec(pk, ord, fill, out, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class ForwardFillExec(
    partKeys: Seq[Expression],
    order: Expression,
    fill: Expression,
    outAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ outAttr

  override def producedAttributes: AttributeSet = AttributeSet(outAttr)

  /** One hash exchange on the group keys (or a single partition for a
    * global fill — the caller's scale responsibility, like any global
    * sort). */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partKeys.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(partKeys) :: Nil

  /** Group-contiguous, order-ascending within every partition — the
    * sort EnsureRequirements inserts below us. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq((partKeys :+ order).map(SortOrder(_, Ascending)))

  override def outputPartitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  override protected def withNewChildInternal(newChild: SparkPlan)
      : ForwardFillExec = copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val pk = partKeys
    val fl = fill
    val out = outAttr
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(pk, childOutput)
      val fillBound = BindReferences.bindReference(fl, childOutput)
      val resultProj =
        UnsafeProjection.create(childOutput :+ out, childOutput :+ out)
      val joined = new JoinedRow
      val lastRow = new GenericInternalRow(1)
      var curKey: UnsafeRow = null
      var last: Any = null
      iter.map { row =>
        val k = keyProj(row)
        if (curKey == null || k != curKey) {
          curKey = k.copy()
          last = null
        }
        val v = fillBound.eval(row)
        // non-primitive fill values (UTF8String, arrays) must be copied
        // out of the reused input row before they outlive it
        if (v != null) last = InternalRow.copyValue(v)
        lastRow.update(0, last)
        resultProj(joined(row, lastRow))
      }
    }
  }
}

object ForwardFill {

  /** Idempotently expose the strategy to this session's planner (the
    * `experimental.extraStrategies` route works on ANY session; SQL
    * sessions can instead enable `GraftExtensions`). */
  def register(s: SparkSession): Unit =
    if (!s.experimental.extraStrategies.contains(ForwardFillStrategy))
      s.experimental.extraStrategies =
        ForwardFillStrategy +: s.experimental.extraStrategies

  /** Fill `fillCol` forward (last non-null wins) per `partCols` group in
    * `orderCol` order, as new column `outName`. All columns resolved
    * eagerly against the input frame, so the plan enters the session
    * pre-resolved. */
  def apply(df: DataFrame, partCols: Seq[String], orderCol: String,
      fillCol: String, outName: String): DataFrame = {
    val s = df.sparkSession
    register(s)
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute =
      analyzed.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"forward_fill: no column '$n' in ${analyzed.output.map(_.name)}"))
    val fillAttr = attr(fillCol)
    val out =
      AttributeReference(outName, fillAttr.dataType, nullable = true)()
    ColumnBridge.ofRows(s,
      ForwardFillPlan(partCols.map(attr), attr(orderCol), fillAttr, out,
        analyzed))
  }
}
