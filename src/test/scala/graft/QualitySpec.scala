package graft

import graft.operators.Quality

/** Data-quality report (q96): planted violations of every check kind
  * are counted exactly; the clean sf fixture reports all zeros except
  * where the generator genuinely violates (pinning the fixture's
  * integrity as a side effect). */
class QualitySpec extends SparkSpecBase {

  test("planted violations are counted per check, absence is a 0 row") {
    import spark.implicits._
    val orders = Seq(
      // dup orderkey 1 (2 rows), null priority on 3, orphan custkey 99
      (1L, 10L, Option("1-URGENT"), 100.0),
      (1L, 10L, Option("1-URGENT"), 100.0),
      (2L, 10L, Option("2-HIGH"), 100.0),
      (3L, 11L, None: Option[String], 100.0),
      (4L, 99L, Option("3-MEDIUM"), 100.0)
    ).toDF("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
    val lineitem = Seq(
      (1L, 5.0, 0.05),   // ok
      (2L, 0.0, 0.05),   // qty out of range
      (2L, 5.0, 0.5),    // discount out of range
      (77L, 5.0, 0.05)   // orphan orderkey
    ).toDF("l_orderkey", "l_quantity", "l_discount")
    val customer = Seq((10L, 0), (11L, 42))
      .toDF("c_custkey", "c_nationkey")
    val nation = Seq(0).toDF("n_nationkey")
    val got = Quality.dataQualityReport(orders, lineitem, customer,
        nation).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "orders_null_priority" -> 1L,
      "orders_dup_orderkey" -> 1L,   // one KEY duplicated, not row count
      "orders_orphan_custkey" -> 1L,
      "lineitem_orphan_orderkey" -> 1L,
      "lineitem_qty_out_of_range" -> 1L,
      "lineitem_discount_out_of_range" -> 1L,
      "customer_orphan_nationkey" -> 1L))
  }

  test("q96 on the sf fixture: every check ran; the generated tables " +
      "are referentially clean") {
    val rows = Quality.q96DataQuality(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.size == 7, "all seven checks report")
    assert(rows.values.forall(_ == 0L),
      s"TPC-H-ish generator should be clean, got $rows")
  }
}
