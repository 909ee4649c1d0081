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

  test("pqShared with one full-width subspace reproduces kMeansShared's " +
      "codebook exactly (the m = 1 identity)") {
    val (_, pqCent, _) = Clustering.pqShared(emb, subDim = 64,
      kSub = 8, rounds = 2)
    // one subspace → s ≡ 0 everywhere; the rest IS the k-means chain
    assert(pqCent.filter(col("s") =!= 0L).count() == 0)
    val km = Clustering.kMeansShared(emb, k = 8, rounds = 2)._1
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    val pq = pqCent.collect()
      .map(r => ((r.getLong(1), r.getLong(2)), r.getLong(3))).toMap
    assert(pq == km && pq.nonEmpty)
  }

  test("pqShared hand golden: per-dim subspaces train independent " +
      "integer codebooks; codes are the (d2, cell) argmin and " +
      "distortion sums are exact") {
    import spark.implicits._
    // e3: v0=[0,0] v1=[1000,1000] v2=[1,0] v3=[2,0] v4=[1001,1000]
    // v5=[999,1000]; subDim=1 → subspace 0 = dim 1, subspace 1 = dim 2;
    // kSub=2 seeds v0/v1. Both subspaces converge in one round:
    // s0 codebook {cell0: (0+1+2) div 3 = 1, cell1: 3000 div 3 = 1000},
    // s1 codebook {cell0: 0, cell1: 1000}; final distortions
    // s0/cell0 = 1+0+1 = 2, s0/cell1 = 0+1+1 = 2, s1 = 0.
    val vecs = Seq(
      (0L, Seq(0f, 0f)), (1L, Seq(1f, 1f)),
      (2L, Seq(0.001f, 0f)), (3L, Seq(0.002f, 0f)),
      (4L, Seq(1.001f, 1f)), (5L, Seq(0.999f, 1f)))
      .toDF("vec_id", "embedding")
    val (_, cent, dist) = Clustering.pqShared(vecs, subDim = 1,
      kSub = 2, rounds = 2)
    val c = cent.collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)),
        r.getLong(3))).toMap
    assert(c == Map(
      (0L, 0L, 1L) -> 1L, (0L, 1L, 1L) -> 1000L,
      (1L, 0L, 2L) -> 0L, (1L, 1L, 2L) -> 1000L), s"$c")
    // codes = per-(vec, subspace) argmin over dist; every vector gets
    // exactly one code per subspace, and the distortion rollup is exact
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id", "s").orderBy(col("d2"), col("cell"))
    val codes = dist
      .withColumn("rk", org.apache.spark.sql.functions.row_number()
        .over(w))
      .filter(col("rk") === 1)
    assert(codes.count() == 12) // 6 vectors × 2 subspaces
    val distort = codes.groupBy("s", "cell")
      .agg(sum(col("d2")).as("d")).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(distort == Map((0L, 0L) -> 2L, (0L, 1L) -> 2L,
      (1L, 0L) -> 0L, (1L, 1L) -> 0L), s"$distort")
  }

  test("q283 shortlist recall curve is monotone non-decreasing per " +
      "query (nested ADC prefixes) with a fixed 10-row brute baseline") {
    val rows = Similarity.queries("q283_pq_adc_recall")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(rows.nonEmpty && rows.forall(_._3 == 10L))
    rows.groupBy(_._2).foreach { case (qid, qr) =>
      val byShort = qr.sortBy(_._1).map(_._4)
      byShort.sliding(2).foreach { case Array(a, b) =>
        assert(a <= b, s"recall not monotone for qid=$qid: $byShort")
      case _ => ()
      }
    }
  }

  test("ivfAdcTopK with all cells probed and an unbounded shortlist " +
      "degenerates to the exact integer-d2 brute top-10 (the q34c-style " +
      "full-probe identity for the composed IVF-ADC pipeline)") {
    val served = Similarity.ivfAdcTopK(spark, sf, probes = 8,
      shortlist = Int.MaxValue, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // independent brute: e3 integer d2 straight off the raw embeddings
    val ex = emb.select(col("vec_id"),
      org.apache.spark.sql.functions.posexplode(
        expr("transform(CAST(embedding AS array<double>)," +
          " x -> CAST(floor(x * 1000.0 + 0.5) AS BIGINT))"))
        .as(Seq("d0", "x")))
    val exq = ex.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("d0"), col("x").as("xq"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("qid")
      .orderBy(col("d2"), col("vec_id"))
    val brute = ex.join(exq, "d0")
      .filter(col("vec_id") =!= col("qid"))
      .groupBy("qid", "vec_id")
      .agg(sum((col("x") - col("xq")) * (col("x") - col("xq")))
        .as("d2"))
      .withColumn("rank", org.apache.spark.sql.functions.row_number()
        .over(w))
      .filter(col("rank") <= 10)
      .collect() // columns: (qid, vec_id, d2, rank)
      .map(r => (r.getLong(0), r.getInt(3).toLong, r.getLong(1),
        r.getLong(2)))
      .toSet
    assert(served == brute && served.size == 50, s"${served.size}")
  }

  test("q293 residual stream golden: rex(vec 0, dim 1) = e3 coord " +
      "minus its assigned cell's c3 centroid, replayed from first " +
      "principles off the memoized k-means state") {
    // centroids off the GATED q246 output (cell, dim, c_e3, n_members)
    val c3 = Similarity.queries("q246_kmeans")(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val cells = c3.keys.map(_._1).toSet.toSeq.sorted
    val e0 = emb.filter(col("vec_id") === 0L)
      .select(expr("transform(CAST(embedding AS array<double>)," +
        " x -> CAST(floor(x * 1000.0 + 0.5) AS BIGINT))"))
      .collect().head.getSeq[Long](0)
    // hand assignment: argmin Σ(x−c)² under (d2, cell)
    val best = cells.map { cl =>
      (e0.indices.map(i => {
        val d = e0(i) - c3((cl, i + 1L)); d * d
      }).sum, cl)
    }.min
    val expected = e0.head - c3((best._2, 1L))
    val got = Similarity.pqResShared(spark, sf)._1
      .filter(col("vec_id") === 0L && col("dim") === 1L)
      .collect().map(_.getAs[Long]("x"))
    assert(got.length == 1 && got.head == expected,
      s"rex(0,1)=${got.toSeq} expected $expected (cell ${best._2})")
  }

  test("q293 residual codebooks beat q282's raw codebooks on total " +
      "distortion (residuals concentrate energy — the Jégou claim, " +
      "measured on the fixture)") {
    def total(key: String): Long =
      Similarity.queries(key)(spark, sf)
        .agg(sum(col("distortion"))).collect().head.getLong(0)
    val raw = total("q282_pq_train")
    val res = total("q293_pq_residual_train")
    assert(res < raw, s"residual distortion $res !< raw $raw")
  }

  test("q293b emits both variants over the same 10-row brute baseline") {
    val rows = Similarity.queries("q293b_pq_residual_recall")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(4)))
    assert(rows.map(_._1).toSet == Set("raw", "residual"))
    assert(rows.count(_._1 == "raw") == 5
      && rows.count(_._1 == "residual") == 5)
    assert(rows.forall(_._3 == 10L))
  }

  test("ivfAdcResidualTopK with all cells probed and an unbounded " +
      "shortlist degenerates to ivfAdcTopK's same identity (both " +
      "pipelines meet at exact brute force)") {
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val res = key(Similarity.ivfAdcResidualTopK(spark, sf, probes = 8,
      shortlist = Int.MaxValue, k = 10))
    val raw = key(Similarity.ivfAdcTopK(spark, sf, probes = 8,
      shortlist = Int.MaxValue, k = 10))
    assert(res == raw && res.size == 50, s"${res.size}")
  }

  test("ivfAdcRefineTopK with all cells probed and an unbounded " +
      "shortlist ≡ ranking EVERY vector by the refine-decoded " +
      "reconstruction distance — INDEPENDENT spec-side decode off the " +
      "state frames (the probe/shortlist stages add no error beyond " +
      "the source coding itself, q303's identity)") {
    import org.apache.spark.sql.expressions.Window
    val served = Similarity.ivfAdcRefineTopK(spark, sf, probes = 8,
        shortlist = Int.MaxValue, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    // independent decode: argmin codes re-derived from the dist
    // frames by the documented (d2, cell) rule, centroids from the
    // GATED q246 output, query coords straight off the parquet
    val (_, rcent, rdist, a3) = Similarity.pqResShared(spark, sf)
    val (_, fcent, fdist) = Similarity.pqRefShared(spark, sf)
    val cent = Similarity.queries("q246_kmeans")(spark, sf)
      .select(col("cell").as("kc"), col("dim"), col("c_e3").as("cc"))
    def codesOf(dist: org.apache.spark.sql.DataFrame, name: String) = {
      val w = Window.partitionBy("vec_id", "s")
        .orderBy(col("d2"), col("cell"))
      dist.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("vec_id"), col("s"), col("cell").as(name))
    }
    val recon = a3.withColumnRenamed("cell", "kc")
      .join(codesOf(rdist, "rcell"), "vec_id")
      .join(codesOf(fdist, "fcell"), Seq("vec_id", "s"))
      .join(rcent.select(col("s"), col("cell").as("rcell"),
        col("dim"), col("c").as("rc")), Seq("s", "rcell"))
      .join(fcent.select(col("s"), col("cell").as("fcell"),
        col("dim"), col("c").as("fc")), Seq("s", "fcell", "dim"))
      .join(cent, Seq("kc", "dim"))
      .select(col("vec_id"), col("dim"),
        (col("cc") + col("rc") + col("fc")).as("rec"))
    val q = load(spark, sf, "embeddings").filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"),
        posexplode(col("embedding").cast("array<double>"))
          .as(Seq("d0", "xd")))
      .select(col("qid"), (col("d0") + 1).cast("long").as("dim"),
        floor(col("xd") * lit(1000.0) + lit(0.5)).cast("long")
          .as("xq"))
    val wq = Window.partitionBy("qid")
      .orderBy(col("d2r"), col("vec_id"))
    val brute = recon.join(q, "dim")
      .filter(col("vec_id") =!= col("qid"))
      .groupBy("qid", "vec_id")
      .agg(sum((col("xq") - col("rec")) * (col("xq") - col("rec")))
        .as("d2r"))
      .withColumn("rank", row_number().over(wq).cast("long"))
      .filter(col("rank") <= 10)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(1),
        r.getLong(2))).toSet
    assert(served == brute && served.size == 50, s"${served.size}")
  }

  test("q303b emits all three re-rank variants over the same 10-row " +
      "brute baseline, and the measured replica-size ladder holds on " +
      "this fixture: mean recall adc ≤ refine ≤ exact (what the " +
      "refine codes buy, what dropping raw vectors costs)") {
    val rows = Similarity.queries("q303b_ivfadc_refine_recall")(
        spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(4)))
    assert(rows.map(_._1).toSet == Set("adc", "refine", "exact"))
    assert(Seq("adc", "refine", "exact")
      .forall(v => rows.count(_._1 == v) == 5))
    assert(rows.forall(_._3 == 10L))
    def mean(v: String) =
      rows.filter(_._1 == v).map(_._4).sum / 5
    assert(mean("adc") <= mean("refine")
      && mean("refine") <= mean("exact"),
      s"ladder: adc ${mean("adc")} refine ${mean("refine")} " +
        s"exact ${mean("exact")}")
  }

  test("q309 shortlist=50 rows ≡ q303b's refine variant (identical " +
      "config, two chains — the sweep's anchor), and every row " +
      "scores 10 brute baselines") {
    val sweep = Similarity.queries("q309_refine_shortlist_sweep")(
        spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(4)))
    assert(sweep.length == 20 && sweep.forall(_._3 == 10L))
    val at50 = sweep.filter(_._1 == 50L)
      .map(r => r._2 -> r._4).toMap
    val refine = Similarity.queries("q303b_ivfadc_refine_recall")(
        spark, sf).collect()
      .filter(_.getString(0) == "refine")
      .map(r => r.getLong(1) -> r.getLong(4)).toMap
    assert(at50 == refine, s"sweep@50 $at50 != q303b refine $refine")
  }

  test("q310 m'=4 rows ≡ q303b's refine variant (the sweep's anchor: " +
      "the m'=4 config re-derives q303's graded refine codebooks from " +
      "scratch through the generalized per-dimension decode), " +
      "bytes_per_vec = 4 + m', and the MEAN recall is non-decreasing " +
      "in the refine budget on this fixture — the frontier q309 " +
      "proved the shortlist knob could not buy") {
    val rows = Similarity.queries("q310_refine_budget_sweep")(
        spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(5)))
    assert(rows.length == 15 && rows.forall(_._4 == 10L))
    rows.foreach { r => assert(r._2 == r._1 + 4L, r) }
    val at4 = rows.filter(_._1 == 4L).map(r => r._3 -> r._5).toMap
    val refine = Similarity.queries("q303b_ivfadc_refine_recall")(
        spark, sf).collect()
      .filter(_.getString(0) == "refine")
      .map(r => r.getLong(1) -> r.getLong(4)).toMap
    assert(at4 == refine, s"sweep@m'=4 $at4 != q303b refine $refine")
    def mean(m: Long): Long = {
      val v = rows.filter(_._1 == m).map(_._5)
      v.sum / v.length
    }
    assert(mean(4L) <= mean(8L) && mean(8L) <= mean(16L),
      s"frontier: ${mean(4L)} / ${mean(8L)} / ${mean(16L)}")
  }

  test("q316 kSub=8 rows ≡ q303b's refine variant (the depth sweep's " +
      "anchor — q310 and q316 cross at the graded config), code_bits " +
      "= log2(kSub); the curve is honestly NON-monotone (seeds are " +
      "vec_id < kSub, not nested) and measured FLAT here — depth is " +
      "not the axis that moves codes-only recall, m' is (q310)") {
    val rows = Similarity.queries("q316_refine_ksub_sweep")(
        spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(5)))
    assert(rows.length == 15 && rows.forall(_._4 == 10L))
    rows.foreach { r =>
      assert((1L << r._2.toInt) == r._1, s"code_bits: $r") }
    val at8 = rows.filter(_._1 == 8L).map(r => r._3 -> r._5).toMap
    val refine = Similarity.queries("q303b_ivfadc_refine_recall")(
        spark, sf).collect()
      .filter(_.getString(0) == "refine")
      .map(r => r.getLong(1) -> r.getLong(4)).toMap
    assert(at8 == refine, s"sweep@kSub=8 $at8 != q303b refine $refine")
  }

  test("q284 dims=64 anchor row is structural recall 1.0 (the " +
      "truncated ranking at full width IS the baseline ranking)") {
    val rows = Similarity.queries("q284_dim_trunc_recall")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(4)))
    assert(rows.nonEmpty && rows.forall(_._2 == 10L))
    val full = rows.filter(_._1 == 64L)
    assert(full.length == 5 && full.forall(_._3 == 1000000L),
      s"${full.toSeq}")
  }
}
