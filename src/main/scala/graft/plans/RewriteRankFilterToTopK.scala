package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: plan the SQL spelling of per-group top-k onto the
  * [[GroupTopK]] heap operator, so plain `spark.sql` users get the no-sort
  * plan without knowing the API exists:
  *
  * {{{
  *   SELECT <cols without rn>
  *   FROM (SELECT *, row_number() OVER (PARTITION BY g ORDER BY o) AS rn
  *         FROM t)
  *   WHERE rn <= k [AND other predicates]
  *     ==> Project(cols, [Filter(other,)] GroupTopK(g, o, k, t))
  * }}}
  *
  * Fires only when the rewrite is airtight:
  *  - the window computes EXACTLY ONE expression, a `row_number()` (never
  *    `rank`/`dense_rank`: those emit more than k rows on ties, which a
  *    k-bounded heap cannot);
  *  - the rank attribute appears ONLY in the `rn <= k` / `rn < k` bound
  *    (either literal side) — it must not survive into the projection or
  *    any other predicate, since [[GroupTopK]] does not materialize ranks;
  *  - the partition and order specs are non-empty and the child is a batch
  *    plan ([[GroupTopKExec]] has no streaming state contract).
  *
  * Joins the operator-optimization fixed point via
  * `injectOptimizerRule` ([[graft.functions.GraftExtensions]]), so it runs
  * BEFORE Spark's own `InsertWindowGroupLimit` batch; when it fires, the
  * Window node is gone and no group-limit insertion is needed. A
  * [[WindowGroupLimit]] already present below the window (defensive: rule
  * order is config-dependent) is stripped — the heap subsumes it.
  */
object RewriteRankFilterToTopK extends Rule[LogicalPlan] with PredicateHelper {

  /** `rn <= k` / `rn < k` / `k >= rn` / `k > rn` → the inclusive k. */
  private def bound(e: Expression, rn: Attribute): Option[Int] = e match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType))
      if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, IntegerType))
      if a.semanticEquals(rn) => Some(k - 1)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute)
      if a.semanticEquals(rn) => Some(k)
    case GreaterThan(Literal(k: Int, IntegerType), a: Attribute)
      if a.semanticEquals(rn) => Some(k - 1)
    case _ => None
  }

  private def isRowNumber(ne: NamedExpression): Boolean = ne match {
    case Alias(WindowExpression(RowNumber(),
        WindowSpecDefinition(_, _,
          SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _) =>
      true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p @ Project(projectList, Filter(cond, w: Window))
        if w.windowExpressions.length == 1 &&
          isRowNumber(w.windowExpressions.head) &&
          w.partitionSpec.nonEmpty && w.orderSpec.nonEmpty &&
          !w.child.isStreaming =>
      val rn = w.windowExpressions.head.toAttribute
      val (bounds, rest) = splitConjunctivePredicates(cond)
        .partition(bound(_, rn).isDefined)
      val ks = bounds.flatMap(bound(_, rn))
      val referencesRn = (projectList ++ rest).exists(_.references.contains(rn))
      if (ks.isEmpty || ks.min < 1 || referencesRn) p
      else {
        val base = w.child match {
          case wgl: WindowGroupLimit => wgl.child
          case c => c
        }
        val topk = GroupTopK(w.partitionSpec, w.orderSpec, ks.min, base)
        Project(projectList,
          if (rest.isEmpty) topk else Filter(rest.reduce(And), topk))
      }
  }
}
