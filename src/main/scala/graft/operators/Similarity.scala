package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.functions.VectorOps._

/** Similarity search over embeddings — SURVEY.md §2-B Q34 / north star.
  *
  * Baseline: brute-force cosine top-k — exact, O(Q·N), fine when the
  * query set broadcasts. Scale path: hyperplane-LSH bucketing so each
  * query only scans its own bucket (and the spec measures recall vs the
  * exact baseline). Both are pure DataFrame plans: broadcast join +
  * window top-k, no driver-side loops, so N can be 100 TB of vectors
  * sharded across executors.
  */
object Similarity {

  /** Exact brute-force top-k cosine neighbors for each query vector.
    * `queries` is expected to be small (broadcast side). */
  def knnBrute(vectors: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val base = vectors
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nv", l2Norm(col("v")))
    val qs = queries
      .select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qv"))
      .withColumn("nq", l2Norm(col("qv")))
    val scored = base.join(broadcast(qs), col("vec_id") =!= col("qid"))
      .withColumn("cos",
        cosinePrenormed(dot(col("v"), col("qv")), col("nv"), col("nq")))
    val w = Window.partitionBy("qid")
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id").as("neighbor"),
        col("cos").cast("decimal(18,6)").as("cos"))
  }

  /** Approximate top-k: candidates restricted to the query's hyperplane-
    * LSH bucket. With b planes the expected candidate set is N/2^b — the
    * knob that turns an O(Q·N) scan into an O(Q·N/2^b) one. Exactness is
    * traded for recall (measured against knnBrute in SimilaritySpec). */
  def knnLsh(vectors: DataFrame, queries: DataFrame, k: Int,
      planes: Int = 4): DataFrame = {
    graft.functions.SignatureExprs.register(vectors.sparkSession)
    val base = vectors
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("bucket",
        call_function("graft_hyperplane", col("v"), lit(planes)))
      .withColumn("nv", l2Norm(col("v")))
    val qs = queries
      .select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qv"))
      .withColumn("bucket",
        call_function("graft_hyperplane", col("qv"), lit(planes)))
      .withColumn("nq", l2Norm(col("qv")))
    val scored = base.join(broadcast(qs),
        base("bucket") === qs("bucket") && col("vec_id") =!= col("qid"))
      .withColumn("cos",
        cosinePrenormed(dot(col("v"), col("qv")), col("nv"), col("nq")))
    val w = Window.partitionBy("qid")
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id").as("neighbor"),
        col("cos").cast("decimal(18,6)").as("cos"))
  }

  /** IVF (inverted-file) approximate kNN: partition vectors into C
    * coarse cells (nearest of C centroids), search only the query's cell.
    * Centroids here are a deterministic sample (every N/C-th vector) —
    * real IVF k-means-trains them, but the Spark shape (broadcast
    * centroid assign → cell-colocated search) is identical, and the cell
    * restriction is the entire scale win: O(Q·N/C) instead of O(Q·N). */
  def knnIvf(vectors: DataFrame, queries: DataFrame, k: Int,
      cells: Int = 16): DataFrame = {
    val base = vectors
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val n = base.count()
    val stride = math.max(1L, n / cells)
    val centroids = base.filter(pmod(col("vec_id"), lit(stride)) === 0)
      .limit(cells)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    def assign(df: DataFrame, vcol: String): DataFrame = {
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("dist").asc, col("cid").asc)
      df.join(broadcast(centroids), lit(true))
        .withColumn("dist", -dot(col(vcol), col("cv")))
        .withColumn("r", row_number().over(w))
        .filter(col("r") === 1)
        .drop("dist", "r", "cv")
    }
    val cells_ = assign(base, "v").withColumnRenamed("cid", "cell")
      .withColumn("nv", l2Norm(col("v")))
    val qs = assign(
      queries.select(col("vec_id"), asDouble(col("embedding")).as("qv")),
      "qv")
      .select(col("vec_id").as("qid"), col("qv"),
        col("cid").as("cell"))
      .withColumn("nq", l2Norm(col("qv")))
    val scored = cells_.join(broadcast(qs),
        cells_("cell") === qs("cell") && col("vec_id") =!= col("qid"))
      .withColumn("cos",
        cosinePrenormed(dot(col("v"), col("qv")), col("nv"), col("nq")))
    val w = Window.partitionBy("qid")
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id").as("neighbor"),
        col("cos").cast("decimal(18,6)").as("cos"))
  }

  private def queryVectors(vectors: DataFrame): DataFrame =
    vectors.filter(col("vec_id") < 5)

  def q34aKnnBrute(spark: SparkSession, dir: String): DataFrame = {
    val vecs = load(spark, dir, "embeddings")
    knnBrute(vecs, queryVectors(vecs), k = 10).orderBy("qid", "rank")
  }

  def q34bKnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val vecs = load(spark, dir, "embeddings")
    knnLsh(vecs, queryVectors(vecs), k = 10).orderBy("qid", "rank")
  }

  def q34cKnnIvf(spark: SparkSession, dir: String): DataFrame = {
    val vecs = load(spark, dir, "embeddings")
    knnIvf(vecs, queryVectors(vecs), k = 10).orderBy("qid", "rank")
  }

  /** Implementation-only (cosine scores are engine-specific floats). */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q34a_knn_brute" -> (q34aKnnBrute _),
    "q34b_knn_lsh" -> (q34bKnnLsh _),
    "q34c_knn_ivf" -> (q34cKnnIvf _),
  )
}
