package graft

import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.operators.{Clustering, Similarity}

/** k-means codebook training (Lloyd's) for IVF: structure, monotone WCSS
  * objective, and usability as an IVF codebook. */
class ClusteringSpec extends SparkSpecBase {

  private lazy val emb = load(spark, sf, "embeddings")

  test("kMeans returns k centroids of the input dimension") {
    val (cids, mat) = Clustering.kMeansCentroids(emb, "embedding", k = 8,
      iters = 2)
    assert(cids.length == 8 && mat.length == 8)
    assert(mat.forall(_.length == 64))
    assert(cids.toSeq == (0L until 8L))
  }

  test("Lloyd's objective (WCSS) is non-increasing over iterations") {
    val wcssByIter = (0 to 3).map { iters =>
      val (cids, mat) =
        Clustering.kMeansCentroids(emb, "embedding", k = 8, iters = iters)
      Clustering.wcss(emb, "embedding", cids, mat)
    }
    wcssByIter.sliding(2).foreach { case Seq(prev, next) =>
      // float-sum noise tolerance: 1e-9 relative
      assert(next <= prev * (1.0 + 1e-9),
        s"WCSS increased: $prev -> $next (all: $wcssByIter)")
    }
    // and training actually helps vs the raw hash-sampled init
    assert(wcssByIter.last < wcssByIter.head)
  }

  test("trained codebook drives the same zero-shuffle IVF assignment") {
    val (cids, mat) = Clustering.kMeansCentroids(emb, "embedding", k = 8,
      iters = 2)
    graft.functions.NearestCentroidExpr.register(spark)
    val assigned = emb
      .withColumn("cell", call_function("graft_nearest_centroid",
        col("embedding").cast("array<double>"),
        typedlit(cids.toSeq), typedlit(mat.map(_.toSeq).toSeq)))
    val cells = assigned.select("cell").distinct().collect().map(_.getLong(0))
    assert(cells.nonEmpty && cells.forall(c => c >= 0 && c < 8))
    // every vector lands in exactly one cell (total function)
    assert(assigned.filter(col("cell").isNull).count() == 0)
  }

  test("kMeansShared hand golden: two planted clusters separate, " +
      "centroids are exact truncating-div integer means, assignment " +
      "tie order is (d2, cell)") {
    import spark.implicits._
    // e3 quantized: A = {[0,0],[1,0],[2,0]}, B = {[1000,1000] ×3 ±1};
    // seeds vec 0 ∈ A, vec 1 ∈ B → round 1 separates the clusters and
    // the update gives c0 = [(0+1+2) div 3, 0] = [1, 0],
    // c1 = [(1000+1001+999) div 3, 1000] = [1000, 1000]; round 2 is a
    // fixed point.
    val vecs = Seq(
      (0L, Seq(0f, 0f)), (1L, Seq(1f, 1f)),
      (2L, Seq(0.001f, 0f)), (3L, Seq(0.002f, 0f)),
      (4L, Seq(1.001f, 1f)), (5L, Seq(0.999f, 1f)))
      .toDF("vec_id", "embedding")
    val (cent, assign) = Clustering.kMeansShared(vecs, k = 2, rounds = 2)
    val a = assign.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == Map(0L -> 0L, 2L -> 0L, 3L -> 0L,
      1L -> 1L, 4L -> 1L, 5L -> 1L), s"$a")
    val c = cent.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(c == Map((0L, 1L) -> 1L, (0L, 2L) -> 0L,
      (1L, 1L) -> 1000L, (1L, 2L) -> 1000L), s"$c")
  }
}
