package graft

import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.operators.Dedup
import graft.operators.Dedup.NearDupIdOffset

/** Near-dup operators: recall against the known planted pairs
  * (doc_id ↔ doc_id + NearDupIdOffset from docsWithNearDups) and
  * precision of the exact verification step. */
class DedupSpec extends SparkSpecBase {

  private lazy val docs = load(spark, sf, "documents")
  private def planted(n: Long) = (0L until n).map(i => (i, i + NearDupIdOffset))

  test("minhash+LSH finds planted near-dups with high recall, verified") {
    val pairs = Dedup.minhashPairs(Dedup.docsWithNearDups(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val found = pairs.toSet
    val recall = planted(500).count(found.contains).toDouble / 500
    assert(recall > 0.95, s"recall $recall")
  }

  test("minhash verification filters by true jaccard") {
    val jac = Dedup.minhashPairs(Dedup.docsWithNearDups(docs))
      .collect().map(_.getDouble(2))
    assert(jac.forall(_ >= 0.5))
  }

  test("ngram jaccard exact pairs ⊇ planted pairs") {
    val found = Dedup.ngramJaccardPairs(Dedup.docsWithNearDups(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = planted(500).count(found.contains).toDouble / 500
    assert(recall > 0.99, s"recall $recall")
  }

  test("minhash candidates ≈ exact jaccard pairs (LSH vs ground truth)") {
    val lsh = Dedup.minhashPairs(Dedup.docsWithNearDups(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.ngramJaccardPairs(Dedup.docsWithNearDups(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // LSH output is a subset of exact (same threshold, verified), and
    // misses few pairs.
    assert(lsh.subsetOf(exact))
    assert(lsh.size.toDouble / exact.size > 0.9)
  }

  test("simhash finds planted near-dups; hamming bound holds") {
    val rows = Dedup.simhashPairs(Dedup.docsWithNearDups(docs)).collect()
    assert(rows.forall(_.getInt(2) <= 3))
    val found = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = planted(500).count(found.contains).toDouble / 500
    assert(recall > 0.30, s"recall $recall") // single-prefix LSH: partial
  }

  test("embedding near-dup finds scaled copies via hyperplane LSH") {
    val emb = load(spark, sf, "embeddings")
    val rows = Dedup.embeddingNearDupPairs(Dedup.embeddingsWithNearDups(emb))
      .collect()
    val found = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = planted(500).count(found.contains).toDouble / 500
    assert(recall > 0.7, s"recall $recall")
    assert(rows.forall(_.getDouble(2) >= 0.95))
  }

  test("exact dedup: distinct-text count matches groupBy-distinct sum") {
    val viaDistinct = docs.select("text").distinct().count()
    val viaAgg = docs.agg(countDistinct(col("text"))).collect().head.getLong(0)
    assert(viaDistinct == viaAgg)
  }
}
