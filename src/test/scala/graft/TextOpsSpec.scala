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

  test("q59: tf-idf scores match a hand-computed golden") {
    import spark.implicits._
    // 4 docs; "rare" appears in 1 doc, "common" in all 4.
    val docs = Seq(
      (1L, "common rare rare"), (2L, "common common x"),
      (3L, "common y y"), (4L, "common z")
    ).toDF("doc_id", "text")
    val out = TextOps.tfidfTopTerms(docs, k = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // idf_scaled = (4*10000) div df: rare→40000, common→10000.
    // doc 1: rare tf=2 → 80000; common tf=1 → 10000.
    assert(out.take(2).toSeq == Seq(
      (1L, "rare", 80000L, 1L), (1L, "common", 10000L, 2L)))
    // every doc emits at most k rows, ranks start at 1
    val perDoc = out.groupBy(_._1)
    assert(perDoc.values.forall(rs =>
      rs.length <= 2 && rs.map(_._4).sorted.sameElements(1L to rs.length)))
    // doc 2: common tf=2 → 20000 beats x (tf=1, df=1 → 40000)? No:
    // x scores 40000 > common 20000 — rarity wins, pinning the formula.
    assert(out.filter(_._1 == 2L).head._2 == "x")
  }
}
