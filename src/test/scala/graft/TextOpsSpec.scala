package graft

import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.operators.TextOps

/** Text operators: the fuzzy-match length banding must be lossless
  * (≡ the naive theta join) and must plan as a hash join. */
class TextOpsSpec extends SparkSpecBase {

  test("q57: length-banded fuzzy match ≡ naive theta join (lossless)") {
    val cust = load(spark, sf, "customer")
    val banded = TextOps.fuzzyMatchPairs(cust, "c_nationkey", "c_custkey",
        "c_name").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val a = cust.select(col("c_nationkey").cast("long").as("n1"),
      col("c_custkey").as("i1"), col("c_name").as("m1"))
    val naive = a.join(
        cust.select(col("c_nationkey").cast("long").as("n2"),
          col("c_custkey").as("i2"), col("c_name").as("m2")),
        col("n1") === col("n2") && col("i1") < col("i2"))
      .where(levenshtein(col("m1"), col("m2")) <= 2)
      .select(col("n1"), col("i1"), col("i2"),
        levenshtein(col("m1"), col("m2")).cast("long").as("d"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(banded == naive)
    assert(banded.nonEmpty) // fixture names do produce close pairs
  }

  test("q57: candidate generation is a hash join on (block, band)") {
    val plan = TextOps.q57FuzzyMatch(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"non-hash join:\n$plan")
  }
}
