package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Per-group top-k as a first-class plan node — the "best k documents per
  * domain" selector a curation funnel runs constantly.
  *
  * Honest positioning vs the rank-window spelling (`row_number() OVER
  * (PARTITION BY g ORDER BY v) <= k`): Spark 4's own `WindowGroupLimit`
  * rewrite (SPARK-37099) already inserts a partial per-group limit before
  * the exchange for exactly that filter shape, so shuffle VOLUME is no
  * longer the differentiator — measured on a 5M-row profile table, both
  * plans ship the identical ~16k surviving rows ([[TopKProbe]]). What the
  * window plan still pays is a full SORT of every input partition to feed
  * its rank limiter (O(n log n) map-side, on all n rows), then a
  * sort+rank of the survivors post-shuffle. This node replaces both with
  * bounded k-row heaps: admission is one comparison per row against the
  * group's current worst (O(n log k) only on the rows that improve the
  * heap, no sort of the input ever) — the probe measures ~2× end-to-end on
  * warm 5M-row runs, and the gap widens with partition size since sort is
  * superlinear. It also generalizes to selectors the rank rewrite cannot
  * match (any k picked at plan-build time per call site, composed inside
  * other operators — [[graft.operators.Sketches.kmvDistinct]] rides it for
  * KMV survivor selection).
  *
  * Mechanics: a **partial** phase keeps a bounded k-row heap per group per
  * input partition (map-side, no exchange), so the ONE hash exchange
  * carries at most `groups_in_partition × k` rows, then a **final** phase
  * merges heaps per group. Same two-phase contract as partial/final hash
  * aggregation, so memory is bounded the same way: retained state is
  * `distinct groups per partition × k` row copies (the input rows stream
  * through un-buffered) — spill-free by construction wherever a hash
  * aggregate over the same keys fits.
  *
  * Registered pieces (the full custom-operator tier of
  * `SparkSessionExtensions`): [[GroupTopK]] logical node →
  * [[GroupTopKStrategy]] (injected planner strategy) → two [[GroupTopKExec]]
  * physical nodes; `EnsureRequirements` inserts the hash exchange demanded by
  * the final node's `ClusteredDistribution`. Rows keep their child schema —
  * `output = child.output` — so column pruning below and predicates above
  * behave as for any opaque unary node.
  *
  * Semantics: emit, per distinct value of `groupExprs`, the first k child
  * rows under the total order `order` (ties broken by including a unique
  * column in `order` — with a non-total order the survivors on the tie
  * boundary are arbitrary, exactly as `row_number` would be). Groups with
  * fewer than k rows emit all of them. Reference shape: TakeOrderedAndProject
  * is Spark's own global (k, no group) special case of this plan.
  */
case class GroupTopK(groupExprs: Seq[Expression], order: Seq[SortOrder],
                     k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"GroupTopK needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupTopK =
    copy(child = newChild)
}

object GroupTopK {

  /** Public entry: per-`groupCols` top-`k` rows of `df` under `orderBy`
    * (column name → ascending?). Include a unique tiebreak column last in
    * `orderBy` for deterministic output.
    */
  def topK(df: DataFrame, groupCols: Seq[String],
           orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(groupCols.nonEmpty, "topK needs at least one group column")
    require(orderBy.nonEmpty, "topK needs at least one order column")
    val lp = df.queryExecution.analyzed
    def attr(n: String): Attribute =
      lp.output.filter(a => a.name.equalsIgnoreCase(n)) match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"topK: no column '$n' in [${lp.output.map(_.name).mkString(", ")}]")
        case many => throw new IllegalArgumentException(
          s"topK: ambiguous column '$n' (${many.size} matches) — " +
            "disambiguate with aliases before calling")
      }
    val order = orderBy.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    GraftBridge.ofRows(df.sparkSession, GroupTopK(groupCols.map(attr), order, k, lp))
  }
}

/** Physical per-group top-k. `partial = true` runs on the child's own
  * partitioning (map-side); `partial = false` demands
  * `ClusteredDistribution(groupExprs)` so every group's survivors meet in one
  * task. Both phases run the identical bounded-heap loop; the pair composes
  * exactly like partial/final aggregation.
  */
case class GroupTopKExec(groupExprs: Seq[Expression], order: Seq[SortOrder],
                         k: Int, partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "output rows"),
    "numGroups" -> SQLMetrics.createMetric(sparkContext, "groups"))

  override protected def withNewChildInternal(newChild: SparkPlan): GroupTopKExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val outRows = longMetric("numOutputRows")
    val groups = longMetric("numGroups")
    val childOutput = child.output
    val gExprs = groupExprs
    val ord = order
    val kk = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(gExprs, childOutput)
      val lt = RowOrdering.create(ord, childOutput)
      // heap head = the WORST retained row (reverse order), so admission is
      // one compare against the head and eviction is poll()
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](
            math.min(kk, 16) + 1, lt.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kk) heap.add(row.copy())
        else if (lt.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      groups.add(heaps.size().toLong)
      val it = heaps.values().iterator()
      new Iterator[InternalRow] {
        private var cur: Array[InternalRow] = Array.empty
        private var i = 0
        override def hasNext: Boolean = {
          while (i >= cur.length && it.hasNext) {
            val h = it.next()
            cur = h.toArray(new Array[InternalRow](h.size()))
            // per-group ascending emit — deterministic when `order` is total
            java.util.Arrays.sort(cur, lt)
            i = 0
          }
          i < cur.length
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          val r = cur(i); i += 1; outRows.add(1L); r
        }
      }
    }, preservesPartitioning = true)
  }
}

/** Planner strategy: one logical [[GroupTopK]] → final-over-partial
  * [[GroupTopKExec]] pair (injected via
  * `SparkSessionExtensions.injectPlannerStrategy` in
  * [[graft.functions.GraftExtensions]]).
  */
class GroupTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupTopK(g, o, k, child) =>
      GroupTopKExec(g, o, k, partial = false,
        GroupTopKExec(g, o, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}
