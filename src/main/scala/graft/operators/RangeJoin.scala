package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load

/** RANGE (point-in-interval) JOIN — the second classic operator Spark's
  * built-ins lack: `point BETWEEN lo AND hi` joins plan as
  * BroadcastNestedLoopJoin (O(n·m)) when neither side broadcasts.
  *
  * Banded form (the standard scale trick): pick a bin width, explode each
  * interval to the bins it overlaps, map each point to its single bin,
  * EQUI-join on the bin, then apply the exact range predicate as a
  * post-filter. The shuffle is a hash join on bin ids; each point lives
  * in exactly one bin so no pair can match twice (no dedup pass).
  *
  * Scale: cost is |points| + Σ(interval span / width) exploded rows —
  * linear, tunable by `binWidth`; a hot bin degrades to an AQE skew-join,
  * not a cross product. Width ≈ typical interval length keeps the
  * explode factor ≈ 2.
  */
object RangeJoin {

  /** Inner join of `points` to every interval containing them.
    * @param points    rows with a numeric point column `pCol`
    * @param intervals rows with numeric `loCol`/`hiCol` (inclusive)
    * @param binWidth  banding width — ≈ typical interval length
    */
  def rangeJoin(points: DataFrame, pCol: String, intervals: DataFrame,
      loCol: String, hiCol: String, binWidth: Double): DataFrame = {
    val binned = intervals.withColumn("__bin",
      explode(sequence(floor(col(loCol) / binWidth),
        floor(col(hiCol) / binWidth))))
    val pb = points.withColumn("__bin", floor(col(pCol) / binWidth))
    pb.join(binned, Seq("__bin"))
      .filter(col(pCol) >= col(loCol) && col(pCol) <= col(hiCol))
      .drop("__bin")
  }

  /** Q38: suppliers whose account balance falls in each customer's
    * [acctbal, acctbal+500] band. `+ 500` is an exact-double add, so the
    * boundary comparisons are bit-identical across engines (D6). */
  def q38RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val intervals = load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal").as("lo"),
        (col("c_acctbal") + lit(500.0)).as("hi"))
    val points = load(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_acctbal"))
    rangeJoin(points, "s_acctbal", intervals, "lo", "hi", binWidth = 500.0)
      .select(col("c_custkey"), col("s_suppkey"))
      .orderBy("c_custkey", "s_suppkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q38_range_join" -> (q38RangeJoin _),
  )

  val oracle: Map[String, String] = Map(
    "q38_range_join" ->
      """SELECT c_custkey, s_suppkey FROM customer c
        |JOIN supplier s
        |  ON s.s_acctbal BETWEEN c.c_acctbal AND c.c_acctbal + 500
        |ORDER BY c_custkey, s_suppkey""".stripMargin,
  )
}
