package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

case class RjPoint(pid: Long, p: Double)
case class RjInterval(iid: Long, lo: Double, hi: Double)

/** Banded range join: golden on a tiny fixture (inclusive boundaries,
  * bin-crossing intervals, negative values) and equivalence with the
  * naive theta-join on the q38 tables. */
class RangeJoinSpec extends SparkSpecBase {

  import spark.implicits._

  test("banded join matches boundaries inclusively across bin edges") {
    val points = Seq(RjPoint(1, 0.0), RjPoint(2, 499.999), RjPoint(3, 500.0),
      RjPoint(4, 1000.0), RjPoint(5, -250.0)).toDF()
    val intervals = Seq(
      RjInterval(10, 0.0, 500.0),     // spans bins 0..1 inclusive ends
      RjInterval(20, 400.0, 600.0),   // crosses a bin edge
      RjInterval(30, -300.0, -100.0)  // negative bins
    ).toDF()
    val got = RangeJoin.rangeJoin(points, "p", intervals, "lo", "hi", 500.0)
      .select("iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(got == Set((10L, 1L), (10L, 2L), (10L, 3L),
      (20L, 2L), (20L, 3L), (30L, 5L)))
  }

  test("q38 equals the naive theta join (banding is lossless)") {
    val naive = graft.Tables.load(spark, sf, "customer")
      .join(graft.Tables.load(spark, sf, "supplier"),
        col("s_acctbal") >= col("c_acctbal") &&
          col("s_acctbal") <= col("c_acctbal") + lit(500.0))
      .select("c_custkey", "s_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = RangeJoin.q38RangeJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == naive)
    assert(banded.nonEmpty)
  }

  test("q38 plan equi-joins on bins — no nested-loop join") {
    val plan = RangeJoin.q38RangeJoin(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan.take(500))
  }
}
