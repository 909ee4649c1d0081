package graft

import org.apache.spark.sql.functions._

import graft.operators.Stats

/** Statistical aggregates: the exact-power-sum formulations must agree
  * with Spark's own streaming-moment aggregates to float tolerance
  * (they differ only in accumulation error), and the conditional/argmax
  * surface must match a direct recomputation. */
class StatsSpec extends SparkSpecBase {

  test("q51: power-sum stats match Spark's stddev/var/covar/corr/slope") {
    val got = Stats.q51Stats(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    val ref = graft.Tables.load(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(var_samp(col("l_quantity")).as("v"),
        stddev_samp(col("l_quantity")).as("s"),
        covar_samp(col("l_quantity"), col("l_discount")).as("cv"),
        corr(col("l_quantity"), col("l_discount")).as("cr"),
        (covar_samp(col("l_quantity"), col("l_discount")) /
          var_samp(col("l_quantity"))).as("b1"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(got.keySet == ref.keySet)
    got.foreach { case (flag, (v, s, cv, cr, b1)) =>
      val (rv, rs, rcv, rcr, rb1) = ref(flag)
      def close(a: Double, b: Double) =
        math.abs(a - b) <= 1e-6 * math.max(math.abs(b), 1e-9)
      assert(close(v, rv), s"$flag var $v vs $rv")
      assert(close(s, rs), s"$flag std $s vs $rs")
      assert(close(cv, rcv), s"$flag covar $cv vs $rcv")
      assert(close(cr, rcr), s"$flag corr $cr vs $rcr")
      assert(close(b1, rb1), s"$flag slope $b1 vs $rb1")
    }
  }

  test("q55: conditional/argmax aggregates match a direct recomputation") {
    val rows = Stats.q55CondAggs(spark, sf).collect()
    assert(rows.nonEmpty)
    val orders = graft.Tables.load(spark, sf, "orders")
      .select("o_orderpriority", "o_orderkey", "o_custkey", "o_totalprice")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    rows.foreach { r =>
      val prio = r.getString(0)
      val grp = orders.filter(_._1 == prio)
      assert(r.getLong(1) == grp.count(_._4 > 200000), s"$prio n_big")
      assert(r.getLong(2) == (if (grp.forall(_._4 > 0)) 1L else 0L),
        s"$prio all_pos")
      assert(r.getLong(3) == (if (grp.exists(_._4 > 400000)) 1L else 0L),
        s"$prio any_huge")
      assert(r.getLong(4) == grp.maxBy(_._2)._3, s"$prio last_cust")
      assert(r.getLong(5) == grp.minBy(_._2)._3, s"$prio first_cust")
    }
  }
}
