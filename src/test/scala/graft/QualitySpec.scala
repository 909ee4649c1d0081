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

  test("q162 Benford == driver recomputation from exact cents; " +
      "shares conserve") {
    import org.apache.spark.sql.functions._
    val cents = graft.Tables.load(spark, sf, "orders")
      .select(graft.Tables.dec(col("o_totalprice")).as("p")).collect()
      .map(_.getDecimal(0).movePointRight(2).longValueExact())
      .filter(_ > 0)
    val expect = cents.map(_.toString.charAt(0).asDigit.toLong)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val total = cents.length.toLong
    val got = Quality.q162Benford(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(g => g._1 -> g._2).toMap == expect)
    got.foreach { case (_, n, ppm) =>
      assert(ppm == n * 1000000L / total)
    }
    assert(got.map(_._2).sum == total)
  }

  test("q221 join cardinality golden: planted duplicate keys, a " +
      "disjoint key, and a self-join multiply exactly") {
    import spark.implicits._
    // L keys [1,1,2,3], R keys [1,2,2,4]:
    //   matched keys {1,2}; |L⋈R| = 2·1 + 1·2 = 4; amp = 4·1000/4.
    val l = Seq(1L, 1L, 2L, 3L).toDF("k")
    val r = Seq(1L, 2L, 2L, 4L).toDF("k")
    val got = Quality.joinCardinality(Seq(("t", l, "k", r, "k")))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getLong(5)))
    assert(got.toSeq == Seq(("t", 4L, 4L, 2L, 4L, 1000L)))
    // empty intersection → zero rows predicted, never null
    val r2 = Seq(9L).toDF("k")
    val z = Quality.joinCardinality(Seq(("z", l, "k", r2, "k")))
      .collect().head
    assert(z.getLong(3) == 0L && z.getLong(4) == 0L &&
      z.getLong(5) == 0L)
  }

  test("q221 law: the predicted join_rows EQUALS the row count of " +
      "actually executing each join on the fixture") {
    import org.apache.spark.sql.functions._
    val rows = Quality.q221JoinCardinality(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    def cnt(lt: String, lk: String, rt: String, rk: String): Long =
      graft.Tables.load(spark, sf, lt).select(col(lk).as("k"))
        .join(graft.Tables.load(spark, sf, rt)
          .select(col(rk).as("k")), "k")
        .count()
    assert(rows("customer.c_custkey=orders.o_custkey") ==
      cnt("customer", "c_custkey", "orders", "o_custkey"))
    assert(rows("orders.o_orderkey=lineitem.l_orderkey") ==
      cnt("orders", "o_orderkey", "lineitem", "l_orderkey"))
    assert(rows("part.p_partkey=lineitem.l_partkey") ==
      cnt("part", "p_partkey", "lineitem", "l_partkey"))
    assert(rows("lineitem.l_partkey=lineitem.l_partkey") ==
      cnt("lineitem", "l_partkey", "lineitem", "l_partkey"))
  }

  test("q163 k-anonymity == driver recomputation over QI classes, " +
      "monotone in k") {
    import org.apache.spark.sql.functions._
    val classes = graft.Tables.load(spark, sf, "customer")
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n")).collect().map(_.getLong(2))
    val got = Quality.q163KAnonymity(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    Seq(2L, 5L, 10L, 25L).foreach { k =>
      val (nc, below, exposed) = got(k)
      assert(nc == classes.length.toLong)
      assert(below == classes.count(_ < k).toLong, s"k=$k")
      assert(exposed == classes.filter(_ < k).sum, s"k=$k")
    }
    // risk is monotone in the threshold
    val ks = Seq(2L, 5L, 10L, 25L).map(got(_)._2)
    assert(ks == ks.sorted)
  }
}
