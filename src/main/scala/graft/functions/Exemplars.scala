package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables.load

/** UDF / UDAF / UDTF surface — SURVEY.md §2-B Q36.
  *
  * Policy (SURVEY §4): built-in functions beat UDFs (codegen, pushdown),
  * so the engine uses built-ins everywhere it can; these exemplars prove
  * the extension surface works end-to-end and each one is oracle-checked
  * against the equivalent pure-SQL form.
  */
object Exemplars {

  /** Scalar UDF: uppercase 3-prefix (≡ UPPER(SUBSTR(s,1,3))). */
  val prefixUpper = udf((s: String) =>
    if (s == null) null else s.toUpperCase.take(3))

  /** Typed UDAF via Aggregator: max-min range of a long column
    * (≡ MAX(x)-MIN(x)), merged associatively across partitions — the
    * partial-aggregation shape any custom metric needs at scale. */
  object RangeAgg extends Aggregator[Long, (Long, Long), Long] {
    def zero: (Long, Long) = (Long.MaxValue, Long.MinValue)
    def reduce(b: (Long, Long), a: Long): (Long, Long) =
      (math.min(b._1, a), math.max(b._2, a))
    def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
      (math.min(x._1, y._1), math.max(x._2, y._2))
    def finish(b: (Long, Long)): Long = b._2 - b._1
    def bufferEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  def q36aUdf(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "part")
      .select(col("p_partkey"), prefixUpper(col("p_name")).as("pu"))
      .orderBy("p_partkey")

  def q36bUdaf(spark: SparkSession, dir: String): DataFrame = {
    val rangeOf = udaf(RangeAgg)
    load(spark, dir, "lineitem")
      .agg(rangeOf(col("l_orderkey")).as("ok_range"))
  }

  /** Generator (UDTF-style) via typed flatMap: text → word stream, then
    * a distinct count so the result is oracle-comparable. A true custom
    * Catalyst Generator is only warranted when flatMap's row-at-a-time
    * overhead shows up in profiles. */
  def q36cUdtf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    load(spark, dir, "documents")
      .select(col("text")).as[String]
      .flatMap(_.split(" "))
      .distinct()
      .agg(count(lit(1)).as("n_words"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q36a_udf_scalar" -> (q36aUdf _),
    "q36b_udaf_typed" -> (q36bUdaf _),
    "q36c_udtf_flatmap" -> (q36cUdtf _),
  )

  val oracle: Map[String, String] = Map(
    "q36a_udf_scalar" ->
      """SELECT p_partkey, UPPER(SUBSTR(p_name, 1, 3)) AS pu
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q36b_udaf_typed" ->
      "SELECT MAX(l_orderkey) - MIN(l_orderkey) AS ok_range FROM lineitem",
    "q36c_udtf_flatmap" ->
      """SELECT COUNT(*) AS n_words FROM (
        |  SELECT DISTINCT unnest(string_split(text, ' ')) AS w
        |  FROM documents)""".stripMargin,
  )
}
