package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, AttributeReference, Expression, GenericInternalRow, JoinedRow, SortOrder,
  UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Logical node: keep the top `k` rows of each group under `order`,
  * emitting the input columns plus a 1-based `gtk_rank`.
  *
  * Why a custom operator (SURVEY.md §4 contingency): the composable form —
  * `row_number().over(Window.partitionBy(g).orderBy(o)) <= k` — fully sorts
  * every group (O(n log n) per partition, full materialization in the sort
  * buffer) and only then filters. At 100 TB with small k that's almost all
  * wasted work. This operator keeps a k-bounded heap per group:
  * O(n log k) time, O(groups·k) memory, same single shuffle.
  */
case class TopKPerGroup(
    k: Int,
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    child: LogicalPlan,
    // constructor param (not a body val): `copy` during optimizer rewrites
    // must preserve the exprId or downstream references dangle
    rankAttr: Attribute = AttributeReference("gtk_rank", IntegerType, nullable = false)())
  extends UnaryNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

/** Physical operator, planned in TWO phases like a hash aggregate:
  *
  *   - `partial = true`: runs on the child's existing partitioning (no
  *     required distribution), keeps a k-bounded heap per group per input
  *     partition and emits the surviving rows WITHOUT a rank. Top-k is
  *     algebraic — the global top-k of a group is contained in the union
  *     of its per-partition top-ks — so this is lossless, and it bounds
  *     the shuffle at k·groups rows PER MAP TASK instead of the whole
  *     input. This is what keeps a low-group-cardinality ranking (e.g.
  *     top-5 per label with a handful of labels) from funneling the full
  *     pair set through n_groups reducers.
  *   - `partial = false` (final): requires clustering on the group key
  *     (EnsureRequirements inserts the single hash shuffle of the tiny
  *     partials), re-heaps per group, and emits the 1-based rank.
  */
case class TopKPerGroupExec(
    k: Int,
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    rankAttr: Attribute,
    child: SparkPlan,
    partial: Boolean = false)
  extends UnaryExecNode {

  override def nodeName: String =
    if (partial) "TopKPerGroupPartial" else "TopKPerGroup"

  // numOutputRows on the partial phase IS the shuffle volume the final
  // phase receives — the measurable form of the "k·groups rows per map
  // task" bound (pinned in TopKSpec, visible in the SQL UI)
  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] =
    Map("numOutputRows" ->
      org.apache.spark.sql.execution.metric.SQLMetrics
        .createMetric(sparkContext, "output rows"))

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    if (partial) org.apache.spark.sql.catalyst.expressions.AttributeSet.empty
    else org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val childOutput = child.output
    val groupExprsLocal = groupExprs
    val orderLocal = order
    val outputSchema = output
    val partialLocal = partial
    val numOutputRows = longMetric("numOutputRows")
    child.execute().mapPartitions { it =>
      val groupProj = UnsafeProjection.create(groupExprsLocal, childOutput)
      val ordering = GenerateOrdering.generate(orderLocal, childOutput)
      // worst-kept-row on top so eviction is O(log k)
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      it.foreach { row =>
        val key = groupProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kLocal + 1, ordering.reversed())
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < kLocal) {
          heap.add(row.copy())
        } else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      if (partialLocal) {
        // survivors only; order within the group is the final phase's job
        val toUnsafe = UnsafeProjection.create(outputSchema, outputSchema)
        heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
          .map { r => numOutputRows += 1; toUnsafe(r) }
      } else {
        val toUnsafe = UnsafeProjection.create(outputSchema, outputSchema)
        val joined = new JoinedRow
        heaps.values().iterator().asScala.flatMap { heap =>
          val rows = new Array[InternalRow](heap.size())
          var i = heap.size() - 1
          while (i >= 0) { rows(i) = heap.poll(); i -= 1 } // drain worst-first → best-first array
          rows.iterator.zipWithIndex.map { case (r, idx) =>
            numOutputRows += 1
            toUnsafe(joined(r, new GenericInternalRow(Array[Any](idx + 1))))
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Planner strategy mapping the logical node to its exec. Injected by
  * [[GraftExtensions]].
  */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(k, g, o, child, rank) =>
      // two-phase: map-side partial heaps bound the shuffle at k·groups
      // rows per task; the final phase ranks after the (tiny) exchange
      val part = TopKPerGroupExec(k, g, o, rank, planLater(child), partial = true)
      TopKPerGroupExec(k, g, o, rank, part) :: Nil
    case _ => Nil
  }
}

/** User-facing API: `GroupTopK(df, 3, Seq("o_custkey"), Seq(desc("price")))`.
  * Group/order columns are resolved against the analyzed child plan, so the
  * node enters the planner fully resolved.
  */
object GroupTopK {
  def apply(df: DataFrame, k: Int, groupCols: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    val analyzed = df.queryExecution.analyzed
    def resolve(name: String): Attribute =
      analyzed.output.find(a => spark.sessionState.conf.resolver(a.name, name))
        .getOrElse(throw new IllegalArgumentException(
          s"column $name not in ${analyzed.output.map(_.name).mkString(", ")}"))
    val groupExprs = groupCols.map(resolve)
    val order = orderCols.map { c =>
      org.apache.spark.sql.graft.GraftDatasetBridge.expression(spark, c) match {
        case so: SortOrder => so.copy(child = bind(so.child, analyzed))
        case e => SortOrder(bind(e, analyzed), org.apache.spark.sql.catalyst.expressions.Ascending)
      }
    }
    org.apache.spark.sql.graft.GraftDatasetBridge.ofRows(spark,
      TopKPerGroup(k, groupExprs, order, analyzed))
  }

  /** Resolve UnresolvedAttributes inside a Column expression by name. */
  private def bind(e: Expression, plan: LogicalPlan): Expression = e.transform {
    case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
      plan.output.find(_.name.equalsIgnoreCase(u.name))
        .getOrElse(throw new IllegalArgumentException(s"column ${u.name} not found"))
  }
}
