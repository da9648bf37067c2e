package graft.catalyst

import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** The [[ApproxAboveThreshold]] valve, generalized to the OTHER exact
  * aggregate that dies at 100 TB: `count(DISTINCT x)`.
  *
  * Exact distinct counting plans as an Expand + two-phase aggregate
  * whose shuffle carries one row per distinct value per partition —
  * fine while cardinality is bounded, a full-vocabulary shuffle on
  * high-cardinality columns (q100's per-source distinct n-grams is the
  * in-repo example: distinct bigrams grow with the corpus). This rule
  * rewrites single-column `count(DISTINCT x)` → HyperLogLog++
  * (`approx_count_distinct`, Heule et al. 2013 — bounded sketch,
  * map-side combinable, same LongType) whenever the aggregate's input
  * is estimated to exceed a size threshold. Small/parity workloads
  * keep exactness — the sf0.01 oracle gate never sees the rewrite —
  * and large ones keep liveness, no query changes.
  *
  * Config (the ApproxAboveThreshold convention):
  *   spark.graft.approxDistinct.thresholdBytes  (-1 = never rewrite;
  *     default 1 GiB of estimated input)
  *   spark.graft.approxDistinct.rsd             (default 0.05)
  *
  * Deliberately NOT rewritten: multi-column `count(DISTINCT a, b)`
  * (HLL++ takes one child; a struct pack changes null semantics) and
  * distinct SUM/AVG (different function, different fix). Cost
  * discipline is inherited verbatim: `child.stats` walks the subtree,
  * so it is the LAST predicate checked, and the rule runs ONCE per
  * query in the pre-CBO batch, never in the operator-optimization
  * fixpoint.
  *
  * THE `exact_` ALIAS CONTRACT (round-9 review finding): a distinct
  * count is only safely approximable when it is a REPORT value. When
  * it feeds SELECTION semantics — SubstringDedup's `>= 2` duplicated-
  * gram filter and top-N winner ordering (which documents get spans
  * stripped), LmScore's vocabulary size (the smoothing denominator in
  * every surprisal) — a sketch silently changes a data transform, not
  * a number in a report. Those sites alias the aggregate with an
  * `exact_` prefix and this rule NEVER rewrites such an alias, at any
  * size. Greppable, zero-cost, survives analysis (the Alias sits in
  * `aggregateExpressions`). Report-only distinct counts (q100's
  * diversity census, q10/q12 profile columns, q66's overlap counts)
  * stay valve-eligible — graceful degradation is their documented
  * at-scale behavior.
  */
object ApproxDistinctAboveThreshold extends Rule[LogicalPlan] {

  val ThresholdKey = "spark.graft.approxDistinct.thresholdBytes"
  val RsdKey = "spark.graft.approxDistinct.rsd"

  private def threshold: Long =
    SQLConf.get.getConfString(ThresholdKey, (1L << 30).toString).toLong
  private def rsd: Double =
    SQLConf.get.getConfString(RsdKey, "0.05").toDouble

  private def rewritable(ae: AggregateExpression): Boolean = ae match {
    case AggregateExpression(c: Count, _, true, _, _) => c.children.size == 1
    case _ => false
  }

  /** The exact_ contract: an Alias so named pins its whole expression. */
  private def protectedAlias(ne: NamedExpression): Boolean = ne match {
    case a: Alias => a.name.startsWith("exact_")
    case _ => false
  }

  private def hasRewritableDistinctCount(agg: Aggregate): Boolean =
    agg.aggregateExpressions.exists(ne => !protectedAlias(ne) && ne.exists {
      case ae: AggregateExpression => rewritable(ae)
      case _ => false
    })

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val t = threshold
    if (t < 0) return plan
    plan.transform {
      case agg: Aggregate
          if hasRewritableDistinctCount(agg) && agg.child.stats.sizeInBytes > t =>
        agg.copy(aggregateExpressions = agg.aggregateExpressions.map { ne =>
          if (protectedAlias(ne)) ne
          else ne.transform {
            case ae: AggregateExpression if rewritable(ae) =>
              val child = ae.aggregateFunction.children.head
              // HLL++ is LongType like Count — no cast dance needed; the
              // distinct flag drops because the sketch dedups internally
              ae.copy(
                aggregateFunction = HyperLogLogPlusPlus(child, rsd, 0, 0),
                isDistinct = false)
          }.asInstanceOf[NamedExpression]
        })
    }
  }
}
