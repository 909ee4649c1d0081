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

  test("q97 SCD2 laws: versions contiguous, intervals tile, exactly " +
      "one open version per key") {
    val rows = TimeSeries.q97Scd2(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDate(3),
        Option(r.getDate(4)), r.getLong(5)))
    rows.groupBy(_._1).foreach { case (_, vs) =>
      val sorted = vs.sortBy(_._2)
      assert(sorted.map(_._2).sameElements(1L to sorted.length))
      // tiling: each version ends where the next starts
      sorted.iterator.zip(sorted.iterator.drop(1)).foreach {
        case (a, b) => assert(a._4.contains(b._3))
      }
      // exactly the last version is open and current
      assert(sorted.init.forall(v => v._4.isDefined && v._5 == 0L))
      assert(sorted.last._4.isEmpty && sorted.last._5 == 1L)
    }
    assert(rows.nonEmpty)
  }

  test("q100 sweep-line peak matches a driver-side day-by-day replay") {
    import java.time.LocalDate
    val got = TimeSeries.q100Concurrency(spark, sf).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val days = graft.Tables.load(spark, sf, "lineitem")
      .select(to_date(col("l_shipdate")).as("d")).collect()
      .map(r => r.getDate(0).toLocalDate.toEpochDay)
    val deltas = scala.collection.mutable.Map[Long, Long]()
    days.foreach { d =>
      deltas(d) = deltas.getOrElse(d, 0L) + 1
      deltas(d + 15) = deltas.getOrElse(d + 15, 0L) - 1
    }
    var run = 0L
    val exp = scala.collection.mutable.Map[String, Long]()
    deltas.toSeq.sortBy(_._1).foreach { case (d, dl) =>
      run += dl
      val m = LocalDate.ofEpochDay(d).withDayOfMonth(1).toString
      exp(m) = math.max(exp.getOrElse(m, Long.MinValue), run)
    }
    assert(got == exp.toMap)
  }

  test("q165 CUSUM changepoint == driver replay of the scaled " +
      "prefix statistic") {
    val daily = graft.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("d")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
      .groupBy(_._1._1).view
      .mapValues(_.toSeq.map { case ((_, d), n) => (d, n) }
        .sortBy(_._1.toEpochDay)).toMap
    val got = graft.operators.TimeSeries
      .q165CusumChangepoint(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDate(3).toLocalDate, r.getLong(4))).toMap
    daily.foreach { case (et, ds) =>
      val dd = ds.size.toLong
      val s = ds.map(_._2).sum
      var p = 0L
      val cs = ds.zipWithIndex.map { case ((d, n), i) =>
        p += n
        (d, (dd * p - (i + 1) * s).abs)
      }
      val peak = cs.maxBy(_._2)
      val day = cs.filter(_._2 == peak._2).minBy(_._1.toEpochDay)._1
      assert(got(et) == ((dd, s, day, peak._2)), et)
    }
  }

  test("q161 Fano factor == driver power-sum recomputation") {
    val daily = graft.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("d")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expect = daily.groupBy(_._1._1).map { case (et, m) =>
      val ns = m.values.toSeq
      val dDays = ns.size.toLong
      val s = ns.sum
      val q = ns.map(n => n * n).sum
      et -> (dDays, s,
        if (dDays > 1 && s > 0) ((dDays * q - s * s) * 1000000L) /
          ((dDays - 1) * s)
        else 0L)
    }
    val got = graft.operators.TimeSeries.q161FanoFactor(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expect)
  }

  test("q222 peak rate == driver recomputation of the per-minute " +
      "argmax (ties → earliest) and cross-multiplied ratios") {
    val ev = graft.Tables.events(spark, sf)
      .select(col("event_type"),
        expr("ts_ns div 60000000000").as("m")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byType = ev.groupBy(_._1).view.mapValues { rs =>
      val perMin = rs.groupBy(_._2).view
        .mapValues(_.length.toLong).toMap
      val (pkMin, pkC) = perMin.toSeq
        .minBy { case (m, c) => (-c, m) } // count desc, minute asc
      val n = rs.length.toLong
      val act = perMin.size.toLong
      (act, n, pkC, pkMin, n * 1000L / act, pkC * act * 1000L / n)
    }.toMap
    val got = graft.operators.TimeSeries.q222PeakRate(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(got == byType)
    // burst ratio ≥ mean by construction (peak ≥ mean per-active-min)
    got.values.foreach { case (_, _, _, _, _, burst) =>
      assert(burst >= 1000L)
    }
  }

  test("q157: arithmetic weekday matches java.time on the fixture " +
      "dates, and weekly margins reconcile") {
    import java.time.LocalDate
    val rows = graft.operators.TimeSeries
      .q157DowSeasonality(spark, sf).collect()
    assert(rows.nonEmpty)
    // recompute per (type, java.time ISO dow) from raw events
    val ev = graft.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("d")).collect()
      .map(r => (r.getString(0),
        r.getDate(1).toLocalDate.getDayOfWeek.getValue.toLong))
    val expect = ev.groupBy(identity).view.mapValues(_.length.toLong)
      .toMap
    rows.foreach { r =>
      val key = (r.getString(0), r.getLong(1))
      assert(expect(key) == r.getLong(2), s"$key")
    }
    // margins: per type, Σn = total and Σexcess7 = 0
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(3)).sum == 0L)
    }
  }

  test("q289 Theil-Sen: driver replay of the median-of-slopes and " +
      "median-intercept rules from first principles (one year)") {
    val out = TimeSeries.queries("q289_theil_sen")(spark, sf).collect()
      .map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val days = graft.Tables.load(spark, sf, "orders")
      .filter(expr("year(o_orderdate) = 1995"))
      .groupBy(datediff(col("o_orderdate"),
        lit("1970-01-01").cast("date")).cast("long").as("dnum"))
      .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
        .as("r"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val slopes = (for {
      i <- days.indices; j <- (i + 1) until days.length
      (da, ra) = days(i); (db, rb) = days(j)
    } yield (((rb - ra) * 1000000L) / (db - da), da, db)).sorted
    val medSlope = slopes(((slopes.length + 1) / 2) - 1)._1
    val ivs = days.map { case (dn, r) =>
      (r * 1000000L - medSlope * dn, dn) }.sorted
    val medIv = ivs(((ivs.length + 1) / 2) - 1)._1
    assert(out(1995L) ==
      ((days.length.toLong, slopes.length.toLong, medSlope, medIv)),
      s"${out(1995L)} vs ($medSlope, $medIv)")

    // q290 companion: replay S and the ×18 tie-corrected variance on
    // the same year from first principles
    val mk = TimeSeries.queries("q290_mann_kendall")(spark, sf)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val sStat = (for {
      i <- days.indices; j <- (i + 1) until days.length
    } yield java.lang.Long.signum(days(j)._2 - days(i)._2).toLong).sum
    val n = days.length.toLong
    val tie = days.groupBy(_._2).values.map(_.length.toLong)
      .filter(_ > 1).map(t => t * (t - 1) * (2 * t + 5)).sum
    val var18 = n * (n - 1) * (2 * n + 5) - tie
    assert(mk(1995L) == ((n, slopes.length.toLong, sStat, var18)),
      s"${mk(1995L)} vs ($sStat, $var18)")
  }

  test("q292 Spearman: driver replay of the untied-rank 6·Σd² for one " +
      "type pair, and denom = n(n²−1) for all pairs") {
    val rows = TimeSeries.queries("q292_spearman")(spark, sf)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(rows.nonEmpty)
    rows.values.foreach { case (n, _, denom) =>
      assert(denom == n * (n * n - 1))
    }
    val daily = graft.Tables.events(spark, sf)
      .groupBy(col("event_type"),
        expr("unix_date(to_date(ts))").as("dnum"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("c"))
      .collect() // dnum is INT (unix_date), count is LONG
      .map(r => (r.getString(0), r.getInt(1).toLong, r.getLong(2)))
    // ranks WITHIN the pair's common-day sample (advice r13): join on
    // day first, then rank each side inside the joined frame.
    val common = daily.filter(_._1 == "click").map(_._2).toSet &
      daily.filter(_._1 == "purchase").map(_._2).toSet
    def ranks(t: String): Map[Long, Long] =
      daily.filter(x => x._1 == t && common(x._2))
        .sortBy(x => (x._3, x._2)).zipWithIndex
        .map { case ((_, d, _), i) => d -> (i + 1L) }.toMap
    val (ra, rb) = (ranks("click"), ranks("purchase"))
    val d26 = 6L * common.toSeq
      .map(d => (ra(d) - rb(d)) * (ra(d) - rb(d))).sum
    val got = rows(("click", "purchase"))
    assert(got == ((common.size.toLong, d26,
      common.size.toLong * (common.size.toLong * common.size - 1))),
      s"$got vs ($d26)")
  }
}
