package graft

import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.operators.SkewUtils

/** Salted join / salted aggregation: results must equal the unsalted
  * equivalents while spreading hot keys across reducers. */
class SkewSpec extends SparkSpecBase {

  test("salted join equals plain join on a hot-key workload") {
    val li = load(spark, sf, "lineitem") // l_suppkey: only 10 values → hot
    val supp = load(spark, sf, "supplier")
    val plain = li.join(supp, li("l_suppkey") === supp("s_suppkey"))
      .groupBy("s_name").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // saltedJoin joins on equal column names; rename to align
    val saltedResult = SkewUtils.saltedJoin(
        li.withColumnRenamed("l_suppkey", "k"),
        supp.withColumnRenamed("s_suppkey", "k"), "k")
      .groupBy("s_name").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(saltedResult == plain)
  }

  test("AQE skew-join is enabled in every graft session shape and a " +
      "planted-skew fact-fact merge join stays exact (verdict r6 item 9)") {
    // The TPC-H-shaped fact-fact joins (q04 family, q107, …) rely on
    // AQE's runtime skew splitting rather than manual salting — that
    // only holds while the configs stay at their Spark defaults. Pin
    // them: SparkSpecBase/Bench/Verify all build sessions without
    // touching either key, so a future session-config edit that turns
    // AQE or skewJoin off fails HERE by name.
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true",
      "AQE off: runtime skew-join splitting is unavailable")
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true",
      "AQE skew-join handling disabled")
    // Planted 4:1 hot key through the q04 shape (fact join dim on a
    // key), forced to a shuffle merge join (the plan AQE skew-splits at
    // scale; local volumes stay under the 256 MB split threshold, so
    // this asserts exactness, not a plan change).
    val n = 200000L
    val left = spark.range(n).select(
      when(col("id") % 4 =!= 0, lit(1L))
        .otherwise(col("id") % 97).as("k"),
      col("id").as("v"))
    val right = spark.range(97).select(col("id").as("k"),
      (col("id") * 10).as("w"))
    val joined = left.join(right.hint("merge"), "k")
    assert(joined.count() == n) // every left row matches exactly once
    val gotW = joined.agg(sum(col("w"))).head().getLong(0)
    val wantW = left.agg(sum(col("k") * 10)).head().getLong(0)
    assert(gotW == wantW, "skewed join lost or duplicated rows")
  }

  test("salted count/sum equals plain aggregation") {
    val li = load(spark, sf, "lineitem")
    val plain = li.groupBy("l_suppkey")
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast("decimal(18,2)")).as("sum"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDecimal(2)))).toMap
    val salted = SkewUtils.saltedCountSum(li, "l_suppkey",
        col("l_quantity").cast("decimal(18,2)"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDecimal(2)))).toMap
    assert(salted.keySet == plain.keySet)
    plain.foreach { case (k, (cnt, s)) =>
      assert(salted(k)._1 == cnt)
      assert(salted(k)._2.compareTo(s) == 0)
    }
  }
}
