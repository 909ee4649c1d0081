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
}
