package graft

import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.plans.BandedRangeJoinRule

/** BandedRangeJoinRule: an un-hinted inequality join rewrites to a hash
  * join under the flag, results identical to the nested-loop plan. */
class BandedRuleSpec extends SparkSpecBase {

  private def thetaJoin = load(spark, sf, "customer")
    .join(load(spark, sf, "supplier"),
      col("s_acctbal") >= col("c_acctbal") &&
        col("s_acctbal") <= col("c_acctbal") + lit(500.0))
    .select("c_custkey", "s_suppkey")

  test("flag off: nested-loop join (the problem the rule removes)") {
    BandedRangeJoinRule.disable(spark)
    val p = thetaJoin.queryExecution.executedPlan.toString
    assert(p.contains("NestedLoop") || p.contains("CartesianProduct"),
      p.take(400))
  }

  test("flag on: banded equi-join, identical results") {
    BandedRangeJoinRule.disable(spark)
    val expected = thetaJoin.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    BandedRangeJoinRule.enable(spark, width = 500.0)
    try {
      val df = thetaJoin
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
        p.take(600))
      assert(p.contains("__graft_bin"), p.take(600))
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected)
      assert(got.nonEmpty)
    } finally BandedRangeJoinRule.disable(spark)
  }

  test("equi-joins and non-range joins are untouched") {
    BandedRangeJoinRule.enable(spark, width = 500.0)
    try {
      val p = load(spark, sf, "nation")
        .join(load(spark, sf, "region"),
          col("n_regionkey") === col("r_regionkey"))
        .queryExecution.executedPlan.toString
      assert(!p.contains("__graft_bin"), p.take(400))
    } finally BandedRangeJoinRule.disable(spark)
  }
}
