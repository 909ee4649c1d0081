package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Opt-in optimizer rule: rewrite inner joins whose condition contains a
  * point-in-interval pair (`p >= lo AND p <= hi` with `p` from one side
  * and `lo`/`hi` from the other) into the BANDED form — add
  * `floor(p/width)` to the point side, explode the bound side to every
  * bin in `[floor(lo/width), floor(hi/width)]`, equi-join on the bin,
  * keep the original predicate as the exact residual filter.
  *
  * Without an equi-conjunct Spark plans such joins as
  * BroadcastNestedLoopJoin (O(n·m) and OOM-prone when neither side is
  * small); with this rule the SAME user query gets a hash join. The
  * rewrite is lossless for any width (RangeJoinSpec proves the operator
  * form; BandedRuleSpec pins rule-on ≡ rule-off results).
  *
  * Enable: `BandedRangeJoinRule.enable(spark, width)` (or set
  * `spark.graft.bandedRangeJoin=true` with
  * `spark.graft.bandedRangeJoin.width=<w>` on a session whose
  * extraOptimizations include the rule). Width ≈ typical interval
  * length; explode factor ≈ 1 + len/width.
  */
object BandedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val Flag = "spark.graft.bandedRangeJoin"
  val WidthFlag = "spark.graft.bandedRangeJoin.width"

  private val BinPrefix = "__graft_bin"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(Flag, "false").toBoolean) plan
    else {
      val width = conf.getConfString(WidthFlag, "1000.0").toDouble
      plan.transform {
        case j @ Join(left, right, Inner, Some(cond), hint)
            if j.resolved && !alreadyBanded(cond) =>
          rewrite(j, left, right, cond, hint, width).getOrElse(j)
      }
    }

  /** A bin-equality conjunct marks an already-rewritten join — without
    * this guard the fixed-point optimizer batch would rewrite forever. */
  private def alreadyBanded(cond: Expression): Boolean =
    cond.exists {
      case a: Attribute => a.name.startsWith(BinPrefix)
      case _ => false
    }

  /** (point, bound, pointOnLeft, isLowerBound) for one comparison, or
    * None when it isn't a cross-side numeric range conjunct. */
  private def classify(e: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Boolean, Boolean)] = {
    def side(x: Expression): Option[Boolean] =
      if (x.references.nonEmpty && x.references.subsetOf(left.outputSet))
        Some(true)
      else if (x.references.nonEmpty && x.references.subsetOf(right.outputSet))
        Some(false)
      else None
    def numeric(x: Expression): Boolean =
      x.dataType.isInstanceOf[NumericType]
    def pair(p: Expression, b: Expression, lower: Boolean) =
      (side(p), side(b)) match {
        case (Some(ps), Some(bs)) if ps != bs && numeric(p) && numeric(b) =>
          Some((p, b, ps, lower))
        case _ => None
      }
    e match {
      case GreaterThanOrEqual(a, b) =>
        pair(a, b, lower = true).orElse(pair(b, a, lower = false))
      case LessThanOrEqual(a, b) =>
        pair(a, b, lower = false).orElse(pair(b, a, lower = true))
      case _ => None
    }
  }

  private def floorBin(x: Expression, width: Double): Expression =
    Floor(Divide(Cast(x, DoubleType), Literal(width)))

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression, hint: org.apache.spark.sql.catalyst.plans.logical.JoinHint,
      width: Double): Option[LogicalPlan] = {
    val ranges = splitConjunctivePredicates(cond)
      .flatMap(classify(_, left, right))
    val candidates = for {
      (p1, lo, pSide1, true) <- ranges
      (p2, hi, pSide2, false) <- ranges
      if pSide1 == pSide2 && p1.semanticEquals(p2)
    } yield (p1, lo, hi, pSide1)
    candidates.headOption.map { case (p, lo, hi, pointOnLeft) =>
      val pBin = Alias(floorBin(p, width), s"${BinPrefix}_p")()
      val binAttr = AttributeReference(s"${BinPrefix}_b", LongType,
        nullable = false)()
      // Sequence is TimeZoneAwareExpression: without an explicit zone it
      // stays unresolved and the optimizer rejects the plan
      val gen = Explode(Sequence(floorBin(lo, width), floorBin(hi, width),
        Some(Literal(1L)), Some(conf.sessionLocalTimeZone)))
      def addPoint(side: LogicalPlan) =
        Project(side.output :+ pBin, side)
      def addBins(side: LogicalPlan) =
        Generate(gen, unrequiredChildIndex = Nil, outer = false,
          qualifier = None, generatorOutput = Seq(binAttr), side)
      val (newLeft, newRight) =
        if (pointOnLeft) (addPoint(left), addBins(right))
        else (addBins(left), addPoint(right))
      val newCond = And(EqualTo(pBin.toAttribute, binAttr), cond)
      Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
    }
  }

  /** Inject into a live session (idempotent) with the given bin width. */
  def enable(spark: SparkSession, width: Double): Unit = {
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
    spark.conf.set(WidthFlag, width.toString)
    spark.conf.set(Flag, "true")
  }

  def disable(spark: SparkSession): Unit = spark.conf.set(Flag, "false")
}
