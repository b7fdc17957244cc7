package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StructType}

/** Optimizer rule: rewrite the universal grouped-top-k idiom
  *
  * {{{ ... WHERE row_number() OVER (PARTITION BY p ORDER BY o) <= k }}}
  *
  * (logically `Filter(rn <= k, Window(row_number, p, o, child))`) into a
  * heap aggregate + explode:
  *
  * {{{ Project(child.* , pos+1 AS rn)
  *     +- Generate posexplode(topk)
  *        +- Aggregate [p] [TopKRowsAgg(o, struct(child.*), k)] }}}
  *
  * Why this matters at scale: the Window form shuffles EVERY row of every
  * group and sorts each partition — at 100 TB the exchange carries the
  * whole table to rank it, then the filter throws almost all of it away.
  * The aggregate form keeps an O(k) heap per group map-side (partial
  * aggregation), so the exchange carries ≤ k rows per (group, mapper) and
  * nothing is ever globally sorted. Same results (ties beyond k resolved
  * arbitrarily — exactly row_number's own tie nondeterminism), exprIds
  * preserved so parent plans are untouched.
  *
  * TIE CAVEAT — stronger than rank nondeterminism: under a NON-total
  * ORDER BY, not just the rank assignment but the selected row SET can
  * differ between the window form and the heap form (TopKRowsAgg rejects
  * rows comparing equal to the current worst, while the window form keeps
  * whichever k the sort happened to place first). Callers that need
  * set-equivalence with the window form — every DuckDB-gated use in this
  * repo (w8, a19, l3) — must order by a TOTAL key, e.g. append a unique
  * tiebreak column (`.orderBy(score.desc, id)`). The guards below can't
  * check totality (it's a data property), so this is a documented
  * precondition, not an enforced one.
  *
  * Guards (rewrite declined unless ALL hold):
  *  - single window expression, plain `row_number()` with the standard
  *    (UnboundedPreceding, CurrentRow) row frame;
  *  - non-empty PARTITION BY (global top-k already plans as
  *    TakeOrderedAndProject) and deterministic partition/order keys;
  *  - the rank predicate is a conjunct of form rn <= k / rn < k /
  *    rn = 1 (k ≤ MaxK so a hostile literal can't demand a giant heap);
  *  - remaining conjuncts don't reference the rank (they're re-applied
  *    above the rewrite).
  *
  * MEASURED VERDICT (TopKBench, 4.8M rows, local[32]) — NOT installed by
  * default: Spark 4's built-in InferWindowGroupLimit + WindowGroupLimitExec
  * already bounds the rank-filter shuffle (23 KiB for the 5-huge-groups
  * case — the partial group-limit runs before the exchange), and for
  * ~100k small groups the builtin shuffles LESS than this rewrite
  * (32.4 vs 40.9 MiB — the heap's payload rows carry the sort keys
  * twice). Wall time: rewrite 0.69 s vs builtin 0.82 s on huge groups
  * (the heap's O(n log k) beats the full local sort), builtin 0.78 vs
  * 0.85 s on small groups. Net: keep Spark's default; this rule remains
  * as an explicit opt-in (experimental.extraOptimizations, or direct
  * application to an optimized plan — AnalyticQueries.w8TopkRewrite) and
  * as the optimizer-rule seam TopKRowsAgg-based operators build on.
  */
object RewriteTopKWindow extends Rule[LogicalPlan] with PredicateHelper {

  /** Heaps are O(k) PER GROUP in executor memory; cap what a literal in a
    * user query can demand. Past this, the window sort is the right plan.
    */
  val MaxK = 1024

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(_, w: Window) => tryRewrite(f, w).getOrElse(f)
  }

  private def tryRewrite(f: Filter, w: Window): Option[LogicalPlan] = {
    val child = w.child
    w.windowExpressions match {
      case Seq(alias @ Alias(WindowExpression(_: RowNumber,
            WindowSpecDefinition(part, order,
              SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _))
          if part.nonEmpty && order.nonEmpty &&
            part.forall(_.deterministic) &&
            order.forall(_.deterministic) &&
            order.forall(so => RowOrdering.isOrderable(so.child.dataType)) =>
        val rnAttr = alias.toAttribute
        val (rnConds, rest) =
          splitConjunctivePredicates(f.condition).partition(_.references.contains(rnAttr))
        extractK(rnConds, rnAttr).filter(k => k >= 1 && k <= MaxK).map { k =>
          rewrite(child, part, order, alias, rnAttr, k, rest)
        }
      case _ => None
    }
  }

  /** The rank conjunct must be exactly one of rn <= k, rn < k+1, rn = 1
    * (either operand order). Anything else — BETWEEN with a lower bound
    * above 1, rn = n with n > 1, rn in a disjunction — declines.
    */
  private def extractK(rnConds: Seq[Expression], rn: Attribute): Option[Int] =
    rnConds match {
      case Seq(LessThanOrEqual(a: Attribute, IntegerLiteral(n))) if a.semanticEquals(rn) => Some(n)
      case Seq(GreaterThanOrEqual(IntegerLiteral(n), a: Attribute)) if a.semanticEquals(rn) => Some(n)
      case Seq(LessThan(a: Attribute, IntegerLiteral(n))) if a.semanticEquals(rn) => Some(n - 1)
      case Seq(GreaterThan(IntegerLiteral(n), a: Attribute)) if a.semanticEquals(rn) => Some(n - 1)
      case Seq(EqualTo(a: Attribute, IntegerLiteral(1))) if a.semanticEquals(rn) => Some(1)
      case Seq(EqualTo(IntegerLiteral(1), a: Attribute)) if a.semanticEquals(rn) => Some(1)
      case _ => None
    }

  private def rewrite(
      child: LogicalPlan,
      part: Seq[Expression],
      order: Seq[SortOrder],
      rnAlias: Alias,
      rnAttr: Attribute,
      k: Int,
      rest: Seq[Expression]): LogicalPlan = {
    val payload = CreateNamedStruct(
      child.output.flatMap(a => Seq(Literal(a.name), a)))
    val aggExpr = TopKRowsAgg(order, payload, k).toAggregateExpression()
    val aggAlias = Alias(aggExpr, "graft_topk")()
    val aggregate = Aggregate(part, Seq(aggAlias), child)

    val payloadType = payload.dataType.asInstanceOf[StructType]
    val posAttr = AttributeReference("graft_pos", IntegerType, nullable = false)()
    val rowAttr = AttributeReference("graft_row", payloadType, nullable = false)()
    val gen = Generate(PosExplode(aggAlias.toAttribute),
      unrequiredChildIndex = Seq(0), outer = false, qualifier = None,
      generatorOutput = Seq(posAttr, rowAttr), aggregate)

    // Reproduce the window's exact output schema AND exprIds so parents
    // (including the residual filter) resolve against the rewrite.
    val fields = child.output.zipWithIndex.map { case (a, i) =>
      Alias(GetStructField(rowAttr, i, Some(a.name)), a.name)(
        exprId = a.exprId, qualifier = a.qualifier)
    }
    val rnOut = Alias(Add(posAttr, Literal(1)), rnAlias.name)(exprId = rnAttr.exprId)
    val proj = Project(fields :+ rnOut, gen)
    if (rest.isEmpty) proj else Filter(rest.reduce(And), proj)
  }
}
