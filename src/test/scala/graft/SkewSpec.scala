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
