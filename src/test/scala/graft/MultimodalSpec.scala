package graft

import graft.operators.Multimodal

/** Multimodal plumbing: schema, partition-parallel decode, determinism,
  * and metadata-only pruning. The codec itself is a stub by design. */
class MultimodalSpec extends SparkSpecBase {

  test("feature extraction: one vector per row, stable across runs") {
    val a = Multimodal.qm1Features(spark, sf).collect()
    val b = Multimodal.qm1Features(spark, sf).collect()
    assert(a.length == 500)
    assert(a.map(_.toString).sameElements(b.map(_.toString)))
    assert(a.forall(_.getAs[Boolean]("decoded_ok")))
    assert(a.forall(_.getAs[Int]("feat_dim") == 8))
  }

  test("decode runs partition-parallel (more than one partition)") {
    val media = Multimodal.syntheticMediaTable(spark, sf).repartition(4)
    val parts = Multimodal.extractFeatures(media)
      .rdd.getNumPartitions
    assert(parts == 4)
    assert(Multimodal.extractFeatures(media).count() == 500)
  }

  test("metadata stats never read payload bytes (column pruning)") {
    val df = Multimodal.metadataStats(
      Multimodal.syntheticMediaTable(spark, sf))
    val rows = df.collect()
    assert(rows.map(_.getString(0)).sameElements(Array("audio", "image", "video")))
    assert(rows.map(_.getLong(1)).sum == 500)
  }

  test("frame sampling: every 4th frame kept, ids dense") {
    val rows = Multimodal.qm3FrameSample(spark, sf).collect()
    assert(rows.nonEmpty)
    val byId = rows.groupBy(_.getLong(0))
    byId.values.foreach { g =>
      assert(g.map(_.getInt(1)).sorted.sameElements(0 until g.length))
    }
  }

  test("qm5: every planted re-ingested copy lands in a dup group " +
      "keyed by the original id") {
    val groups = Multimodal.qm5MediaDups(spark, sf).collect()
    val originals = graft.Tables.load(spark, sf, "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id") % 10 === 0)
      .count()
    // corpus texts are unique, so dup groups are exactly the planted
    // (id, id + 1000000) pairs with the original as keeper
    assert(groups.length == originals)
    assert(groups.forall(r => r.getLong(1) == 2L && r.getLong(3) % 10 == 0))
  }
}
