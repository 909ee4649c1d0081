package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load

/** Deterministic sampling & dataset splits — the reproducibility
  * primitive a training-data pipeline needs: `df.sample()` depends on
  * partitioning and seed plumbing, but a HASH-BUCKET sample is a pure
  * function of the row key — stable across runs, engines, partitionings
  * and cluster sizes, so holdout membership never drifts between
  * pipeline versions (and is checkable against the DuckDB oracle).
  *
  * Bucket = last hex nibble of md5(key): 16 equal buckets. md5 renders
  * identical hex on every engine; bucket membership is a string compare
  * (no integer-conversion dialect differences). Scale: a codegen'd
  * projection + filter — pushdown-friendly, no shuffle, no state.
  */
object Sampling {

  /** 16-way bucket id as the last md5 hex character ('0'..'f'). */
  def md5Bucket(key: Column): Column =
    substring(md5(key.cast("string")), 32, 1)

  private val hex = "0123456789abcdef"

  /** Keep rows whose bucket is in [0, buckets): rate = buckets/16. */
  def deterministicSample(df: DataFrame, keyCol: String,
      buckets: Int): DataFrame = {
    require(buckets >= 1 && buckets <= 16, s"buckets 1..16, got $buckets")
    df.filter(md5Bucket(col(keyCol))
      .isin(hex.take(buckets).map(_.toString): _*))
  }

  /** Disjoint, covering train/val/test split: val gets `valBuckets`
    * 16ths, test the next `testBuckets` 16ths, train the rest. */
  def trainValTestSplit(df: DataFrame, keyCol: String,
      valBuckets: Int = 1, testBuckets: Int = 1)
      : (DataFrame, DataFrame, DataFrame) = {
    require(valBuckets + testBuckets < 16, "no train buckets left")
    val b = md5Bucket(col(keyCol))
    val valSet = hex.take(valBuckets).map(_.toString)
    val testSet = hex.slice(valBuckets, valBuckets + testBuckets)
      .map(_.toString)
    (df.filter(!b.isin(valSet ++ testSet: _*)),
      df.filter(b.isin(valSet: _*)),
      df.filter(b.isin(testSet: _*)))
  }

  /** Q46: per-source doc counts of the deterministic 4/16 sample. */
  def q46Sample(spark: SparkSession, dir: String): DataFrame =
    deterministicSample(load(spark, dir, "documents"), "doc_id", 4)
      .groupBy("source")
      .agg(count(lit(1)).as("n"))
      .orderBy("source")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q46_det_sample" -> (q46Sample _),
  )

  val oracle: Map[String, String] = Map(
    "q46_det_sample" ->
      """SELECT source, COUNT(*) AS n FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)
        |  IN ('0', '1', '2', '3')
        |GROUP BY source ORDER BY source""".stripMargin,
  )
}
