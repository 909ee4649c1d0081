package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in optimizer rule for the 100 TB "approx mode" (SCALE.md): when
  * `spark.graft.approxDistinct=true`, rewrite exact single-column
  * COUNT(DISTINCT x) into HyperLogLogPlusPlus(x) — fixed ~KB sketch
  * state per group instead of shuffling every distinct key. Queries keep
  * their shape; only the aggregate function changes, so the rewrite is
  * transparent to callers that accept approximate counts.
  *
  * This is the `Rule[LogicalPlan]` extension point SURVEY §4 reserved
  * for scale work: injected per-session via
  * `spark.experimental.extraOptimizations` (`ApproxDistinctRule.enable`)
  * or at build time through `graft.functions.GraftExtensions`.
  */
object ApproxDistinctRule extends Rule[LogicalPlan] {

  val Flag = "spark.graft.approxDistinct"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(Flag, "false").toBoolean) plan
    else plan.transformAllExpressions {
      case ae @ AggregateExpression(c: Count, _, true, None, _)
          if c.children.length == 1 =>
        ae.copy(
          aggregateFunction = HyperLogLogPlusPlus(c.children.head),
          isDistinct = false)
    }

  /** Inject into a live session (idempotent). */
  def enable(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
    spark.conf.set(Flag, "true")
  }

  def disable(spark: SparkSession): Unit = spark.conf.set(Flag, "false")
}
