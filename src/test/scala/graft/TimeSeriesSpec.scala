package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.operators.TimeSeries

/** Top-level fixture row (encoder requirement). */
case class TsObs(k: Long, m: Date, v: Double)

/** Time-series gap-fill/forward-fill: hand-computed golden on a sparse
  * fixture plus shape checks on the q54 entry. */
class TimeSeriesSpec extends SparkSpecBase {

  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("resample fills gaps with zero counts and forward-fills values") {
    val obs = Seq(
      TsObs(1, d("2024-01-01"), 10.0),
      TsObs(1, d("2024-04-01"), 40.0), // gap: feb, mar
      TsObs(2, d("2024-03-01"), 7.0)   // different bounds per key
    ).toDF()
    val out = TimeSeries.resample(obs, "k", "m", "interval 1 month",
        aggs = Seq("cnt" -> count(lit(1)), "v" -> max(col("v"))),
        fillZero = Seq("cnt"), ffill = Seq("v"))
      .orderBy("k", "m").collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, "2024-01-01", 1L, 10.0),
      (1L, "2024-02-01", 0L, 10.0), // gap month: cnt 0, value carried
      (1L, "2024-03-01", 0L, 10.0),
      (1L, "2024-04-01", 1L, 40.0),
      (2L, "2024-03-01", 1L, 7.0))) // key 2's grid starts at ITS min
  }

  test("q54: dense monthly grid per customer, counts partition orders") {
    val out = TimeSeries.q54GapFill(spark, sf)
    val rows = out.collect()
    // dense: every customer's months are consecutive (diff = 1 month)
    rows.groupBy(_.getLong(0)).foreach { case (_, g) =>
      val months = g.map(_.getDate(1).toLocalDate).sortBy(_.toEpochDay)
      months.sliding(2).foreach { w =>
        if (w.length == 2) assert(w(0).plusMonths(1) == w(1))
      }
    }
    // total counts equal the source row count for the key slice
    val totalCnt = rows.map(_.getLong(2)).sum
    val src = graft.Tables.load(spark, sf, "orders")
      .filter(col("o_custkey") < 50).count()
    assert(totalCnt == src)
    // forward-fill leaves no nulls after each key's first active month
    rows.groupBy(_.getLong(0)).foreach { case (_, g) =>
      g.sortBy(_.getDate(1).toLocalDate.toEpochDay)
        .foreach(r => assert(!r.isNullAt(3)))
    }
  }
}
