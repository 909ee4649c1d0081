package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.{dec, load}

/** Time-series regularization — gap-filling (resample to a fixed grid)
  * and forward-fill, the standard prep for feature pipelines over
  * irregular event data (per-entity daily/monthly panels).
  *
  * Scale design: the dense grid is generated with `sequence` + `explode`
  * per KEY (one row per key expands to its own grid — distributed, no
  * driver-side calendar), observations attach with one left join on
  * (key, gridpoint), and forward-fill is one window pass per key ordered
  * by time — same shuffle shape as any windowed query. Grid cardinality
  * is #keys × #gridpoints; the window state is one carried value.
  */
object TimeSeries {

  /** Regularize `df` onto a dense per-key time grid.
    *
    * @param keyCol   entity column
    * @param timeCol  grid column (DATE) — already truncated to the grid
    *                 resolution (e.g. `trunc(ts, "month")`)
    * @param step     grid step as a SQL interval literal, e.g.
    *                 "interval 1 month"
    * @param aggs     named aggregates evaluated per (key, gridpoint)
    * @param fillZero aggregate names set to 0 on gap rows (counts)
    * @param ffill    aggregate names forward-filled from the last
    *                 observed gridpoint (state carried per key)
    *
    * Grid bounds are per key (min..max observed gridpoint), so sparse
    * keys don't inflate onto a global calendar. */
  def resample(df: DataFrame, keyCol: String, timeCol: String, step: String,
      aggs: Seq[(String, Column)], fillZero: Seq[String] = Nil,
      ffill: Seq[String] = Nil): DataFrame = {
    val per = df.groupBy(col(keyCol), col(timeCol))
      .agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (n, c) => c.as(n) }: _*)
    val bounds = per.groupBy(keyCol)
      .agg(min(timeCol).as("__mn"), max(timeCol).as("__mx"))
    val grid = bounds.select(col(keyCol),
      explode(sequence(col("__mn"), col("__mx"), expr(step))).as(timeCol))
    val joined = grid.join(per, Seq(keyCol, timeCol), "left")
    val w = Window.partitionBy(keyCol).orderBy(timeCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val zeroed = fillZero.foldLeft(joined) { case (d, n) =>
      d.withColumn(n, coalesce(col(n), lit(0L)))
    }
    ffill.foldLeft(zeroed) { case (d, n) =>
      d.withColumn(n, last(col(n), ignoreNulls = true).over(w))
    }
  }

  /** Q54: monthly order panel for a key slice — gap months appear with
    * cnt = 0 and the month's average price forward-filled from the last
    * active month (exact decimal sum ÷ count, the D2/D6 discipline). */
  def q54GapFill(spark: SparkSession, dir: String): DataFrame = {
    val orders = load(spark, dir, "orders")
      .filter(col("o_custkey") < 50)
      .withColumn("m", trunc(col("o_orderdate").cast("date"), "month"))
    resample(orders, "o_custkey", "m", "interval 1 month",
      aggs = Seq(
        "cnt" -> count(lit(1)),
        "avg_price" -> (sum(dec(col("o_totalprice"))).cast("double") /
          count(lit(1)))),
      fillZero = Seq("cnt"),
      ffill = Seq("avg_price"))
      .withColumnRenamed("avg_price", "avg_price_ff")
      .orderBy("o_custkey", "m")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q54_gapfill" -> (q54GapFill _),
  )

  val oracle: Map[String, String] = Map(
    "q54_gapfill" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |    CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
        |    COUNT(*) AS cnt,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      / COUNT(*) AS avg_price
        |  FROM orders WHERE o_custkey < 50 GROUP BY 1, 2),
        |bounds AS (
        |  SELECT o_custkey, MIN(m) AS mn, MAX(m) AS mx
        |  FROM per GROUP BY 1),
        |grid AS (
        |  SELECT o_custkey,
        |    UNNEST(generate_series(mn, mx, INTERVAL 1 MONTH))::DATE AS m
        |  FROM bounds)
        |SELECT g.o_custkey, g.m,
        |  COALESCE(p.cnt, 0) AS cnt,
        |  last_value(p.avg_price IGNORE NULLS) OVER (
        |    PARTITION BY g.o_custkey ORDER BY g.m
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS avg_price_ff
        |FROM grid g LEFT JOIN per p
        |  ON g.o_custkey = p.o_custkey AND g.m = p.m
        |ORDER BY g.o_custkey, g.m""".stripMargin,
  )
}
