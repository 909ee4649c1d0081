package graft

import org.apache.spark.sql.functions._

import graft.Tables.load

/** Accuracy-knob contracts for the approximate operators (round-3
  * verdict item 10): the 100×-scale path trades exactness for bounded
  * memory via explicit budgets — rsd for HLL distinct counts (q13),
  * the accuracy parameter for GK percentile sketches (q42b). These
  * tests pin (a) each knob's documented error bound and (b) that
  * tightening the knob never makes the answer worse than the coarsest
  * setting — the same contract shape as the round-2 nprobe recall
  * curve (SimilaritySpec). */
class ApproxBudgetSpec extends SparkSpecBase {

  test("q13 knob: approx_count_distinct error shrinks with rsd and " +
      "respects the 3·rsd bound at every setting") {
    val li = load(spark, sf, "lineitem")
    val exact = li.agg(countDistinct(col("l_orderkey"))).head().getLong(0)
    val rsds = Seq(0.15, 0.05, 0.01)
    val errs = rsds.map { rsd =>
      val approx = li.agg(approx_count_distinct(col("l_orderkey"), rsd))
        .head().getLong(0)
      val rel = math.abs(approx - exact).toDouble / exact
      // 3σ bound on the documented relative standard deviation
      assert(rel <= 3 * rsd, s"rsd=$rsd: err $rel > ${3 * rsd}")
      rel
    }
    assert(errs.last <= errs.head + 1e-9,
      s"finest rsd not at least as good as coarsest: $errs")
  }

  test("q42b knob: approx_percentile rank error shrinks with accuracy " +
      "and respects the 1/accuracy bound at every setting") {
    val li = load(spark, sf, "lineitem")
    val n = li.count()
    val vals = li.select(col("l_quantity").cast("double"))
      .collect().map(_.getDouble(0)).sorted
    // l_quantity is heavily tied (integers 1..50), so a value does not
    // have ONE rank but a tie-span [#(< v), #(<= v)]; the GK guarantee
    // is that this span intersects target ± n/accuracy — measure the
    // distance from the target rank to the span (0 when inside).
    def rankSpanDistance(v: Double, target: Double): Double = {
      val lo = vals.count(_ < v).toDouble
      val hi = vals.count(_ <= v).toDouble
      if (target < lo) lo - target
      else if (target > hi) target - hi
      else 0.0
    }
    val p = 0.5
    val accs = Seq(50, 500, 5000)
    val errs = accs.map { acc =>
      val approx = li.agg(
        approx_percentile(col("l_quantity"), lit(p), lit(acc))
          .cast("double")).head().getDouble(0)
      val rankErr = rankSpanDistance(approx, p * n) / n
      assert(rankErr <= 1.0 / acc + 1e-9,
        s"accuracy=$acc: rank error $rankErr > ${1.0 / acc}")
      rankErr
    }
    assert(errs.last <= errs.head + 1e-9,
      s"finest accuracy not at least as good as coarsest: $errs")
  }
}
