package graft

import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.plans.ApproxDistinctRule

/** Optimizer-rule extension: COUNT(DISTINCT) → HLL++ under the opt-in
  * flag, exact otherwise, toggleable at runtime. */
class ApproxRuleSpec extends SparkSpecBase {

  private def distinctParts = load(spark, sf, "lineitem")
    .agg(countDistinct(col("l_partkey")).as("d"))

  test("flag off: exact distinct, no HLL in the plan") {
    ApproxDistinctRule.disable(spark)
    val df = distinctParts
    assert(!df.queryExecution.optimizedPlan.toString
      .toLowerCase.contains("approx_count_distinct"))
    assert(df.collect().head.getLong(0) == 200L)
  }

  test("flag on: rewritten to HLL++, result within sketch error") {
    ApproxDistinctRule.enable(spark)
    try {
      val df = distinctParts
      assert(df.queryExecution.optimizedPlan.toString
        .toLowerCase.contains("approx_count_distinct"))
      val approx = df.collect().head.getLong(0)
      assert(math.abs(approx - 200L) <= 10, s"approx $approx")
    } finally ApproxDistinctRule.disable(spark)
  }

  test("multi-column distinct is left exact (rule scope guard)") {
    ApproxDistinctRule.enable(spark)
    try {
      val df = load(spark, sf, "lineitem")
        .agg(countDistinct(col("l_partkey"), col("l_suppkey")).as("d"))
      assert(!df.queryExecution.optimizedPlan.toString
        .toLowerCase.contains("approx_count_distinct"))
      val exact = load(spark, sf, "lineitem")
        .select("l_partkey", "l_suppkey").distinct().count()
      assert(df.collect().head.getLong(0) == exact)
    } finally ApproxDistinctRule.disable(spark)
  }
}
