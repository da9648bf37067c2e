package graft.catalyst

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, ApproximatePercentile, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** §7.3.3: the 100 TB escape hatch for exact percentiles.
  *
  * Exact `percentile` is an ObjectHashAggregate that ships EVERY input
  * value to a single final reducer per group — correct at golden-test
  * scale, a guaranteed straggler (or OOM) at 100 TB. This rule rewrites
  * `Percentile` → `ApproximatePercentile` (bounded-memory QuantileSummaries
  * sketch, map-side combinable) whenever the aggregate's input is
  * estimated to exceed a size threshold, so small/parity workloads keep
  * exactness and large ones keep liveness — no query changes.
  *
  * Config:
  *   spark.graft.approxPercentile.thresholdBytes  (-1 = never rewrite;
  *     default 1 GiB of estimated input)
  *   spark.graft.approxPercentile.accuracy        (default 10000)
  */
object ApproxAboveThreshold extends Rule[LogicalPlan] {

  val ThresholdKey = "spark.graft.approxPercentile.thresholdBytes"
  val AccuracyKey = "spark.graft.approxPercentile.accuracy"

  private def threshold: Long =
    SQLConf.get.getConfString(ThresholdKey, (1L << 30).toString).toLong
  private def accuracy: Int =
    SQLConf.get.getConfString(AccuracyKey, "10000").toInt

  private def hasExactPercentile(agg: Aggregate): Boolean =
    agg.aggregateExpressions.exists(_.exists {
      case AggregateExpression(p: Percentile, _, _, _, _) =>
        p.frequencyExpression == Literal(1L)
      case _ => false
    })

  /** Cost discipline: `child.stats` is a recursive walk of the whole
    * subtree (uncached on freshly-rewritten nodes), so it must be the
    * LAST predicate checked, and the rule must run ONCE per query
    * (pre-CBO batch), never inside the operator-optimization fixpoint —
    * an earlier fixpoint placement taxed every query in the suite
    * 20–50% whether or not it contained a percentile. */
  override def apply(plan: LogicalPlan): LogicalPlan = {
    val t = threshold
    if (t < 0) return plan
    plan.transform {
      case agg: Aggregate if hasExactPercentile(agg) && agg.child.stats.sizeInBytes > t =>
        agg.transformExpressions {
          case ae @ AggregateExpression(p: Percentile, _, _, _, _)
              if p.frequencyExpression == Literal(1L) =>
            // Type discipline: exact Percentile always yields DOUBLE (or
            // ARRAY<DOUBLE>) via interpolation, but ApproximatePercentile
            // yields the CHILD's type — on int/long columns an uncast
            // swap would leave every downstream double-typed attribute
            // reference stale. Cast back to the exact aggregate's type.
            val approx = ae.copy(aggregateFunction = new ApproximatePercentile(
              p.child, p.percentageExpression, Literal(accuracy)))
            if (approx.dataType == ae.dataType) approx
            else Cast(approx, ae.dataType): Expression
        }
    }
  }
}
