package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graftbridge.Bridge

/** Whole-operator custom plan: bounded per-group top-k as a FIRST-CLASS
  * physical operator — the §7.4(c) escalation layer the expression
  * kernels and optimizer rules don't cover (a new logical node, a
  * planner [[Strategy]], and a physical [[UnaryExecNode]] with its own
  * distribution/ordering contract, the same machinery Spark's built-in
  * `TakeOrderedAndProjectExec` uses for the UNGROUPED shape Spark
  * already has; reference analog: the dashboard's per-slice "worst n"
  * readouts, e.g. scripts/diff_times.py's sorted mart consumed top-n
  * per day in Looker).
  *
  * Contract: emit each group's first `k` rows under `order` (which MUST
  * be total per group — end it with a unique tiebreak). The exec
  * declares `requiredChildDistribution = ClusteredDistribution(group)`
  * and `requiredChildOrdering = group ++ order`, so EnsureRequirements
  * plans exactly one hash exchange + one in-partition sort, and the
  * operator itself is a STREAMING single pass: count rows per
  * consecutive group run, emit while ≤ k. O(1) state beyond the group
  * key copy — no per-group heaps, no buffering, nothing driver-side —
  * so a 100 TB child streams through at scan speed. Value-identical to
  * [[graft.operators.Rank.groupTopK]] minus the rank column
  * (GroupTopKPhysicalSpec pins parity; q155 hash-checks end-to-end).
  */
object GroupTopKPlan {

  /** Logical marker node. `output = child.output` — a pure filter in
    * row-space, so column pruning above it stays correct and unknown-
    * node conservatism below it keeps the child intact. */
  case class GroupTopK(groupExprs: Seq[Expression], order: Seq[SortOrder],
                       k: Int, child: LogicalPlan) extends UnaryNode {
    require(k > 0, "GroupTopK: k must be positive")
    // the exec compares group keys BYTE-WISE (UnsafeRow equality);
    // float/double keys would split -0.0 from 0.0 and every NaN from
    // every other — Spark's own aggregates get NormalizeFloatingNumbers
    // from the optimizer, but a custom node does not, so reject the
    // shape instead of silently diverging (group by a rounded/cast key)
    require(!groupExprs.exists(e =>
      e.dataType == org.apache.spark.sql.types.DoubleType ||
        e.dataType == org.apache.spark.sql.types.FloatType),
      "GroupTopK: floating-point group keys are not supported " +
        "(byte-wise key equality; group by a cast or rounded key instead)")
    override def output: Seq[Attribute] = child.output
    override protected def withNewChildInternal(newChild: LogicalPlan): GroupTopK =
      copy(child = newChild)
  }

  /** Plans the logical marker to [[GroupTopKExec]]. Injected via
    * [[GraftOptimizations.install]] or `spark.sql.extensions`
    * ([[GraftSparkExtensions]]). */
  object GroupTopKStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case GroupTopK(groupExprs, order, k, child) =>
        GroupTopKExec(groupExprs, order, k, planLater(child)) :: Nil
      case _ => Nil
    }
  }

  case class GroupTopKExec(groupExprs: Seq[Expression], order: Seq[SortOrder],
                           k: Int, child: SparkPlan) extends UnaryExecNode {
    override def output: Seq[Attribute] = child.output

    // each group must arrive whole (one partition) and contiguous
    // (sorted runs); EnsureRequirements inserts the exchange + sort
    override def requiredChildDistribution: Seq[Distribution] =
      if (groupExprs.isEmpty) UnspecifiedDistribution :: Nil
      else ClusteredDistribution(groupExprs) :: Nil
    override def requiredChildOrdering: Seq[Seq[SortOrder]] =
      Seq(groupExprs.map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)) ++ order)

    // the pass neither moves nor reorders rows
    override def outputPartitioning = child.outputPartitioning
    override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

    override protected def doExecute(): RDD[InternalRow] = {
      val groupProjExprs = groupExprs
      val childOutput = child.output
      val kk = k
      child.execute().mapPartitions({ it =>
        val proj = UnsafeProjection.create(groupProjExprs, childOutput)
        var current: UnsafeRow = null
        var n = 0L
        it.filter { row =>
          val key = proj(row)
          if (current == null || key != current) {
            // the projection reuses its row buffer — copy the group key
            // (tiny: group columns only), never the data row
            current = key.copy()
            n = 1L
          } else n += 1L
          n <= kk
        }
      }, preservesPartitioning = true)
    }

    override protected def withNewChildInternal(newChild: SparkPlan): GroupTopKExec =
      copy(child = newChild)
  }

  /** DataFrame-level entry point: top `k` rows per `groupCols` group
    * under `sort` — (column, ascending?) pairs whose order must be
    * total per group (end with a unique tiebreak). Attributes are
    * resolved HERE against the analyzed child (a Column-wrapper
    * expression would reach the custom node as an opaque ColumnNode the
    * analyzer only unwraps for built-in operators). The session must
    * have [[GroupTopKStrategy]] installed
    * ([[GraftOptimizations.install]] or `spark.sql.extensions`). */
  def topK(df: DataFrame, groupCols: Seq[String],
           sort: Seq[(String, Boolean)], k: Int): DataFrame = {
    val child = Bridge.logicalPlan(df)
    def attr(n: String): Attribute = child.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"GroupTopK: no column '$n' in [${child.output.map(_.name).mkString(", ")}]"))
    val order = sort.map { case (n, asc) =>
      SortOrder(attr(n),
        if (asc) org.apache.spark.sql.catalyst.expressions.Ascending
        else org.apache.spark.sql.catalyst.expressions.Descending)
    }
    Bridge.dataset(df.sparkSession,
      GroupTopK(groupCols.map(attr), order, k, child))
  }
}
