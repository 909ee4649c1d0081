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

  /** Q97: SCD TYPE-2 INTERVALIZATION — turn a change log into validity
    * intervals: per customer, each order becomes a dimension version
    * valid from its date until the NEXT order's date (`lead`), the
    * latest version open-ended (`valid_to` NULL, `is_current` = 1).
    * This is the standard history-table build every warehouse runs on
    * a CDC feed.
    *
    * Determinism: the version order is (date, orderkey) — a total
    * order even when one customer places two orders the same day (the
    * earlier key's interval is then empty: [d, d), documented).
    * Scale: ONE window pass partitioned by the dimension key; no joins,
    * no state beyond a one-row lookahead. */
  def q97Scd2(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    load(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("valid_from"),
        col("o_orderdate"))
      .withColumn("version", row_number().over(w))
      .withColumn("valid_to",
        lead(to_date(col("o_orderdate")), 1).over(w))
      .withColumn("is_current",
        when(col("valid_to").isNull, 1L).otherwise(0L))
      .select(col("o_custkey"), col("version").cast("long").as("version"),
        col("o_orderkey"), col("valid_from"), col("valid_to"),
        col("is_current"))
      .orderBy("o_custkey", "version")
  }

  /** Q100: INTERVAL CONCURRENCY by sweep-line — peak number of
    * simultaneously in-transit shipments per month (each lineitem is
    * "in transit" for the 15 days [shipdate, shipdate+14]). The
    * interval-overlap problem without any pairwise join: intervals
    * become +1/−1 boundary events on integer epoch days, a running sum
    * over the DAILY aggregate gives the concurrency curve, and a
    * monthly rollup takes the max.
    *
    * Scale: the heavy stream collapses to one row per distinct day
    * BEFORE the ordered prefix sum (partial-combining agg), so the
    * global window — the one unavoidable sequential pass of a
    * sweep-line — runs over calendar-sized data (~2.5k rows)
    * regardless of fact volume. Peak is exact, not sampled: the
    * concurrency curve only changes on boundary days, which are all
    * present. */
  def q100Concurrency(spark: SparkSession, dir: String): DataFrame = {
    val days = load(spark, dir, "lineitem")
      .select(datediff(to_date(col("l_shipdate")),
        lit("1970-01-01").cast("date")).as("dn"))
    val deltas = days.select(col("dn"), lit(1L).as("dl"))
      .unionAll(days.select((col("dn") + 15).as("dn"),
        lit(-1L).as("dl")))
      .groupBy("dn").agg(sum(col("dl")).as("delta"))
    val w = Window.orderBy(col("dn"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas
      .withColumn("conc", sum(col("delta")).over(w))
      .withColumn("d", date_add(lit("1970-01-01").cast("date"),
        col("dn")))
      .groupBy(trunc(col("d"), "month").as("month"))
      .agg(max(col("conc")).as("peak"))
      .orderBy("month")
  }

  /** Q127: inter-arrival-gap percentiles per event type — the latency/
    * cadence profile behind rate limiting, anomaly detection and
    * session-gap tuning (pick the sessionization gap where p99 jumps).
    * Gap = consecutive same-(user, type) event spacing in exact
    * microseconds (ts_ns div 1000 — integer, D6-safe).
    *
    * Scale shape: ONE window pass partitioned by (user_id, event_type)
    * — millions of small partitions, never a global sort — then
    * [[Percentiles.discByRank]]'s disk-spilling rank selection per
    * event_type (the q42/q61 scale fix: no per-group value buffer). */
  def q127ArrivalGaps(spark: SparkSession, dir: String): DataFrame = {
    // Truncate to MICROSECONDS before ordering and differencing (advice
    // r6): the DuckDB oracle sees `ts` at µs precision, so under an
    // INT64-nanos fixture ordering by raw ts_ns and flooring the ns
    // difference would both diverge from the oracle (floor-of-diff ≠
    // diff-of-floors when sub-µs remainders exist). Diff of truncated
    // micros ordered by (µs, event_id) is what the oracle computes in
    // EITHER fixture shape; FixtureGuardSpec additionally asserts the
    // current fixture's ts_ns % 1000 == 0 invariant so a nanos
    // regeneration trips loudly.
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts_us"), col("event_id"))
    val gaps = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        expr("ts_ns div 1000").as("ts_us"), col("event_id"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .filter(col("prev_us").isNotNull)
      .select(col("event_type"),
        (col("ts_us") - col("prev_us")).as("gap_us"))
    Percentiles.discByRank(gaps, Seq("event_type"), "gap_us",
      Seq(0.5 -> "p50_gap_us", 0.9 -> "p90_gap_us",
        0.99 -> "p99_gap_us"), countName = Some("n_gaps"))
      .orderBy("event_type")
  }

  /** Q136: OHLC resampling bars — per (event_type, day): first (open),
    * max (high), min (low) and last (close) value plus the event count.
    * The canonical downsampling shape every metrics/market pipeline
    * runs; a FIRST/LAST-in-order aggregation, a class none of the other
    * window or agg queries exercise (q16's rank picks rows; this picks
    * boundary VALUES under a total in-bar order).
    *
    * Determinism (D1): in-bar order is (µs, event_id) — the same
    * truncation contract as q127, total because event_id is unique.
    * open/close come from two row_number passes (one per direction)
    * rather than min_by/max_by over a struct: both engines express
    * row_number identically, and the window sort spills instead of
    * buffering.
    *
    * Scale: two window passes per (type, day) partition — small dense
    * partitions, no global sort — then one hash agg. */
  /** Operator form over any events frame with (event_type, ts, ts_ns,
    * event_id, value) — the SqlSurface builder target; q136 gates it
    * on the fixture. */
  def ohlcBars(events: DataFrame): DataFrame = {
    val ev = events
      .filter(col("value").isNotNull)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        expr("ts_ns div 1000").as("ts_us"), col("event_id"), col("value"))
    val wf = Window.partitionBy(col("event_type"), col("day"))
      .orderBy(col("ts_us"), col("event_id"))
    val wr = Window.partitionBy(col("event_type"), col("day"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
    ev.withColumn("rn", row_number().over(wf))
      .withColumn("rr", row_number().over(wr))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_events"),
        max(when(col("rn") === 1, col("value"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(when(col("rr") === 1, col("value"))).as("close"))
      .orderBy("event_type", "day")
  }

  def q136Ohlc(spark: SparkSession, dir: String): DataFrame =
    ohlcBars(graft.Tables.events(spark, dir))

  // ---------------------------------------------------------------- q157

  /** Q157: DAY-OF-WEEK seasonality audit — per (event type, ISO
    * weekday): event count, the signed excess over a uniform week
    * (n·7 − total), and the uniformity ratio in ppm (10⁶ = flat). The
    * weekly-periodicity check a monitoring stack runs before trusting
    * any day-grain threshold.
    *
    * Weekday is computed ARITHMETICALLY — ((epoch_day + 3) mod 7) + 1,
    * Monday = 1 (1970-01-01 was a Thursday) — because calendar
    * functions disagree across engines (Spark dayofweek is
    * 1 = Sunday, DuckDB dayofweek is 0 = Sunday): pure integer
    * arithmetic on epoch days is dialect-free. (Dividend is
    * non-negative for any post-1970 date; both engines' % follow the
    * dividend sign, so pre-1970 data would need a pmod — guarded by
    * the fixture's 2024 range.)
    *
    * Scale: one partial-combining (type, dow) agg — ≤ 7·|types| rows
    * out — then margins as a window over that tiny frame. */
  def q157DowSeasonality(spark: SparkSession, dir: String): DataFrame = {
    val cnt = graft.Tables.events(spark, dir)
      .select(col("event_type"),
        expr("(unix_date(CAST(ts AS DATE)) + 3) % 7 + 1").as("dow"))
      .groupBy("event_type", "dow").agg(count(lit(1)).as("n"))
    val wT = Window.partitionBy("event_type")
    cnt.withColumn("total", sum(col("n")).over(wT))
      .select(col("event_type"), col("dow").cast("long").as("dow"),
        col("n"),
        expr("n * 7 - total").as("excess7"),
        expr("(n * 7 * 1000000) div total").as("ratio_ppm"))
      .orderBy("event_type", "dow")
  }

  // ---------------------------------------------------------------- q161

  /** Q161: FANO FACTOR (burstiness) of each event type's daily count
    * series — the variance-to-mean ratio of counts in exact ppm,
    *   fano_ppm = (D·Σn² − (Σn)²)·10⁶ div ((D−1)·Σn),  D = #days —
    * 10⁶ ≈ Poisson arrivals, ≫10⁶ = bursty/overdispersed, ≪10⁶ =
    * metronomic. The overdispersion diagnostic behind alert
    * thresholds: q157 checks WHICH day, this checks HOW SPIKY.
    * All-integer because the observations are counts — no value
    * quantization at all (the power sums are exact by construction;
    * the q51 machinery needed decimals for this, counts don't).
    *
    * Scale: one (type, day) partial-combining count, one ≤|types|·D
    * rollup. D·Σn² stays in BIGINT to ~3·10⁵ events/day/type over a
    * decade; DECIMAL path documented beyond. Degenerate D = 1 maps to
    * 0 (guarded — ANSI). */
  def q161FanoFactor(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"), sum(col("n")).as("s"),
        sum(expr("n * n")).as("q"))
      .select(col("event_type"), col("n_days"), col("s").as("n_events"),
        expr("CASE WHEN n_days > 1 AND s > 0 THEN" +
          " ((n_days * q - s * s) * 1000000)" +
          " div ((n_days - 1) * s) ELSE 0L END").as("fano_ppm"))
      .orderBy("event_type")

  // ---------------------------------------------------------------- q165

  /** Q165: CUSUM CHANGEPOINT detection — per event type, the day
    * where the cumulative deviation of daily counts from the series
    * mean peaks, with the peak's magnitude. The level-shift locator
    * (a regime change maximizes |Σ_{i≤k}(nᵢ − n̄)|) behind "when did
    * the traffic change" — a changepoint CLASS distinct from
    * outliers (q90: single points) and burstiness (q161: global
    * dispersion).
    *
    * Integer-exact: the mean is a fraction, so the statistic is
    * scaled by D — cₖ = D·Pₖ − k·S (Pₖ = prefix sum, S = total, D =
    * #days): exactly D·Σ(nᵢ − S/D), all BIGINT. Argmax under
    * (|c| desc, day asc) via min(struct(−|c|, day)) — deterministic.
    * Scale: one (type, day) partial-combining count, one per-type
    * running-sum window (spill-sorted), one argmax agg. */
  def q165CusumChangepoint(spark: SparkSession, dir: String)
      : DataFrame = {
    val daily = graft.Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))
    val wOrd = Window.partitionBy("event_type").orderBy("d")
    val wAll = Window.partitionBy("event_type")
    daily
      .withColumn("p", sum(col("n"))
        .over(wOrd.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .withColumn("k", row_number().over(wOrd))
      .withColumn("s", sum(col("n")).over(wAll))
      .withColumn("dd", count(lit(1)).over(wAll))
      .withColumn("c", expr("dd * p - CAST(k AS BIGINT) * s"))
      .groupBy("event_type")
      .agg(max(col("dd")).as("n_days"), max(col("s")).as("n_events"),
        min(struct(expr("-abs(c)").as("na"), col("d").as("day")))
          .as("m"))
      .select(col("event_type"), col("n_days"), col("n_events"),
        col("m.day").as("peak_day"), (-col("m.na")).as("cusum_peak"))
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------- q172

  /** Shared daily count series: (event_type, epoch-day, BIGINT count).
    * Counts, not value sums — naturally BIGINT with no quantization
    * choice, and the sums-of-products below stay far inside 2⁶³. */
  private def dailyCounts(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.events(spark, dir)
      .groupBy(col("event_type"),
        expr("unix_date(to_date(ts))").as("dnum"))
      .agg(count(lit(1)).as("c"))

  /** Q172: AUTOCORRELATION of each event type's daily count series at
    * lags 1..7 — the seasonality/persistence diagnostic (a weekly
    * cycle shows as a lag-7 peak, q157's fixed weekday view can't see
    * arbitrary-lag structure). Pairs are observed days (t, t+k) —
    * the fixture grid is dense, and missing days simply drop the pair.
    *
    * Determinism: all five sums (Σx, Σy, Σxy, Σx², Σy²) and both
    * variance numerators are exact BIGINT (counts ≤ 10⁴/day keep
    * n·Σxy < 10¹⁴ ≪ 2⁶³ and < 2⁵³, so the final double CAST is
    * exact); the only IEEE steps are one multiply, one sqrt, one
    * divide, then the floor(x·10⁶+0.5) rounding — the q92/q51
    * identical-op rule. Degenerate (constant) series filter out via
    * the integer variance test, never a 0/0.
    *
    * Scale: one partial-combining (type, day) agg collapses the
    * corpus; everything after runs on |types|·|days| rows. */
  def q172Acf(spark: SparkSession, dir: String): DataFrame = {
    val d = dailyCounts(spark, dir)
    val a = d.withColumn("lag", explode(expr("sequence(1L, 7L)")))
      .select(col("event_type"), col("lag"),
        (col("dnum") + col("lag")).as("dn2"), col("c").as("x"))
    val paired = a.join(
      d.select(col("event_type"), col("dnum").as("dn2"),
        col("c").as("y")),
      Seq("event_type", "dn2"))
    paired.groupBy(col("event_type"), col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(expr("x * y")).as("sxy"),
        sum(expr("x * x")).as("sxx"),
        sum(expr("y * y")).as("syy"))
      .withColumn("num", expr("n_pairs * sxy - sx * sy"))
      .withColumn("varx", expr("n_pairs * sxx - sx * sx"))
      .withColumn("vary", expr("n_pairs * syy - sy * sy"))
      .filter(col("varx") > 0 && col("vary") > 0)
      .select(col("event_type"), col("lag"), col("n_pairs"),
        expr("CAST(floor(CAST(num AS DOUBLE) /" +
          " sqrt(CAST(varx AS DOUBLE) * CAST(vary AS DOUBLE))" +
          " * 1000000 + 0.5) AS BIGINT)").as("acf_e6"))
      .orderBy("event_type", "lag")
  }

  // ---------------------------------------------------------------- q173

  /** Q173: CROSS-SERIES CORRELATION MATRIX — Pearson r between every
    * pair of event types' daily count series, over the days BOTH
    * observed (inner join on the day key). The metric-relatedness
    * audit (do errors spike with clicks?) that q172 answers for one
    * series against itself; same exact-integer + identical-IEEE-final
    * discipline, same magnitudes.
    *
    * Scale: the collapsed (type, day) frame self-joins on the day key
    * only (|types|² fan-out per day — alphabet-bounded); sums
    * partial-combine per type pair. */
  def q173CorrMatrix(spark: SparkSession, dir: String): DataFrame = {
    val d = dailyCounts(spark, dir)
    d.as("a").join(d.as("b"),
        col("a.dnum") === col("b.dnum") &&
          col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("ta"),
        col("b.event_type").as("tb"),
        col("a.c").as("x"), col("b.c").as("y"))
      .groupBy("ta", "tb")
      .agg(count(lit(1)).as("n_days"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(expr("x * y")).as("sxy"),
        sum(expr("x * x")).as("sxx"),
        sum(expr("y * y")).as("syy"))
      .withColumn("num", expr("n_days * sxy - sx * sy"))
      .withColumn("varx", expr("n_days * sxx - sx * sx"))
      .withColumn("vary", expr("n_days * syy - sy * sy"))
      .filter(col("varx") > 0 && col("vary") > 0)
      .select(col("ta"), col("tb"), col("n_days"),
        expr("CAST(floor(CAST(num AS DOUBLE) /" +
          " sqrt(CAST(varx AS DOUBLE) * CAST(vary AS DOUBLE))" +
          " * 1000000 + 0.5) AS BIGINT)").as("corr_e6"))
      .orderBy("ta", "tb")
  }

  // ---------------------------------------------------------------- q179

  /** Q179: SEASONALLY-ADJUSTED anomalies — each (type, day)'s relative
    * deviation from its own WEEKDAY's mean, in exact ppm via the
    * cross-multiplied form (c·n_dow − Σ_dow)·10⁶ div Σ_dow (the q165
    * mean-clearing trick applied per weekday bucket), and the top-3
    * deviating days per type. What q90's global z-score flags wrongly
    * on weekly-cyclic series — a quiet Sunday is NORMAL — this flags
    * correctly: deviation is measured against the matching weekday.
    * Weekday is the q157 arithmetic form (dialect-free).
    *
    * Scale: the (type, day) collapse sees volume once; dow means are a
    * ≤7·|types| broadcast; the rank window runs per type over its day
    * rows. */
  def q179SeasonalAdjust(spark: SparkSession, dir: String): DataFrame = {
    val d = dailyCounts(spark, dir)
      .withColumn("dow", expr("(dnum + 3) % 7 + 1"))
    val dowMean = d.groupBy("event_type", "dow")
      .agg(count(lit(1)).as("n_dow"), sum(col("c")).as("sum_dow"))
    val w = Window.partitionBy("event_type")
      .orderBy(abs(col("dev_ppm")).desc, col("dnum"))
    d.join(broadcast(dowMean), Seq("event_type", "dow"))
      .withColumn("dev_ppm",
        expr("((c * n_dow - sum_dow) * 1000000) div sum_dow"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("event_type"), col("rank"),
        col("dnum").cast("long").as("dnum"),
        col("dow").cast("long").as("dow"), col("c"), col("dev_ppm"))
      .orderBy("event_type", "rank")
  }

  // ---------------------------------------------------------------- q203

  /** Q203: SEASONAL-NAIVE ANOMALY SUMMARY — per event type: residuals
    * against the same-weekday-last-week baseline (rₜ = cₜ − cₜ₋₇ via a
    * dnum−7 self-join, exact under calendar gaps where a row-lag
    * isn't), robust-scaled by the residual MAD (q101's machinery), and
    * the count of days with |r − med| > 3·MAD. The production anomaly
    * detector for strongly weekly series — q165's CUSUM finds ONE mean
    * shift, this flags per-day spikes against the weekly rhythm.
    *
    * All integer: counts, integer residuals, quantile_disc medians.
    * Scale: the seasonal join is day-keyed on the tiny per-(type, day)
    * frame; the two MAD passes are the spill-ranked discByRank. */
  def q203SeasonalResiduals(spark: SparkSession,
      dir: String): DataFrame = {
    val d = dailyCounts(spark, dir)
    val resid = d.join(
        d.select(col("event_type"), (col("dnum") + 7).as("dnum"),
          col("c").as("c7")),
        Seq("event_type", "dnum"))
      .select(col("event_type"), col("dnum"),
        (col("c") - col("c7")).as("resid"))
    val med = Percentiles.discByRank(resid, Seq("event_type"), "resid",
      Seq(0.5 -> "med"), countName = Some("n_days"))
    val dev = resid.join(broadcast(med), "event_type")
      .select(col("event_type"), col("n_days"), col("med"),
        abs(col("resid") - col("med")).as("adev"))
    val mad = Percentiles.discByRank(dev, Seq("event_type"), "adev",
      Seq(0.5 -> "mad"))
    dev.join(broadcast(mad), "event_type")
      .groupBy("event_type")
      .agg(max(col("n_days")).as("n_days"), max(col("med")).as("med"),
        max(col("mad")).as("mad"),
        sum(when(col("adev") > lit(3L) * col("mad"), 1L)
          .otherwise(0L)).as("n_anomalies"))
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------- q222

  /** Q222: PEAK INGEST RATE — per event type: the busiest 1-minute
    * bucket (count + which minute, ties → earliest), the mean
    * per-ACTIVE-minute rate in e3, and the peak/mean burst ratio in
    * e3. The capacity-planning readout (provision for peak, bill for
    * mean); q161's Fano factor summarizes burstiness statistically,
    * this names the actual worst minute. All integer; the argmax is
    * the min(struct(-c, minute)) total tie order.
    *
    * Scale: one (type, minute)-keyed partial-combining count, then a
    * type-keyed rollup over minutes ≪ events. */
  def q222PeakRate(spark: SparkSession, dir: String): DataFrame =
    peakRate(graft.Tables.events(spark, dir))

  /** DataFrame core of q222 — input needs (event_type, ts_ns). */
  def peakRate(events: DataFrame): DataFrame =
    peakRollup(events
      .select(col("event_type"),
        expr("ts_ns div 60000000000").as("minute"))
      .groupBy("event_type", "minute")
      .agg(count(lit(1)).as("c")))

  /** Rollup from per-(event_type, minute) counts to the q222 readout —
    * factored out so the streaming twin's sink-side fold
    * ([[graft.streaming.StreamOps.peakRateStream]] emits the
    * per-minute counts; this folds them) is THE SAME code path as
    * batch. */
  def peakRollup(perMinute: DataFrame): DataFrame =
    perMinute
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_active_minutes"),
        sum(col("c")).as("n_events"),
        min(struct((-col("c")).as("nc"), col("minute").as("m")))
          .as("pk"))
      .select(col("event_type"), col("n_active_minutes"),
        col("n_events"), (-col("pk.nc")).as("peak_per_min"),
        col("pk.m").as("peak_minute"),
        expr("(n_events * 1000) div n_active_minutes")
          .as("mean_per_min_e3"),
        expr("((-pk.nc) * n_active_minutes * 1000) div n_events")
          .as("burst_x1000"))
      .orderBy("event_type")

  // ---------------------------------------------------------------- q224

  /** Q224: REPEAT-PURCHASE LATENCY — per market segment: the
    * distribution (p50/p90 + count) of days between a customer's
    * consecutive orders. q127 profiles event-arrival cadence and q209
    * the order→ship lead; this is the CUSTOMER-lifecycle cadence — the
    * number replenishment forecasting, churn-window sizing ("inactive"
    * = p90 of the segment's reorder gap) and CRM cadence tuning read.
    *
    * Determinism: per-customer order sequence sorted by (orderdate,
    * orderkey); the multiset of adjacent differences of a sorted
    * multiset is tie-order invariant, so gap_days is total. Gaps of 0
    * (same-day reorders) are data, not noise.
    *
    * Scale: one window pass over per-customer partitions (millions of
    * tiny partitions, no global sort), one co-partitioned join to
    * customer on the SAME key the window just partitioned by, then
    * [[Percentiles.discByRank]]'s disk-spilling rank selection per
    * segment — no per-group value buffer anywhere. */
  def q224RepeatLatency(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("dn"), col("o_orderkey"))
    val gaps = graft.Tables.load(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate").cast("date"),
          lit("1970-01-01").cast("date")).cast("long").as("dn"))
      .withColumn("prev", lag(col("dn"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("o_custkey"), (col("dn") - col("prev")).as("gap_days"))
    val seg = gaps.join(
      graft.Tables.load(spark, dir, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
      "o_custkey")
    Percentiles.discByRank(seg, Seq("c_mktsegment"), "gap_days",
      Seq(0.5 -> "p50_days", 0.9 -> "p90_days"),
      countName = Some("n_gaps"))
      .orderBy("c_mktsegment")
  }

  // ---------------------------------------------------------------- q289

  /** Q289: THEIL–SEN ROBUST TREND of daily revenue, per order year —
    * the median of all pairwise slopes (Sen 1968, public): immune to
    * ~29% outlier days where the OLS slope (q146's Holt trend seed,
    * q172's regression family) is dragged by a single flash-sale or
    * outage day. Every step is exact integer arithmetic:
    * revenue in cents (floor(x·100 + 0.5) — the q242 discipline;
    * o_totalprice is DOUBLE in the fixture, and a raw double→BIGINT
    * cast ROUNDS in DuckDB but truncates in Spark), slope_e6 =
    * ((r_b − r_a)·10⁶) div (day_b − day_a) (truncating div, identical
    * both engines for any sign), and the MEDIAN is the
    * ((n+1) div 2)-th element under the TOTAL order (slope_e6, da, db)
    * — rank selection, not an interpolating percentile, so the picked
    * value is a real pair's slope (D1-deterministic). The intercept is
    * the same disc-median of (r·10⁶ − slope_e6·day) over the year's
    * days. Years with a single active day produce no pairs and drop
    * (both engines identically).
    *
    * Scale: median-of-pairs is O(days²) per partition BY CONSTRUCTION
    * (~66k pair rows per year here) — the audit form. At 100 TB run
    * per bounded window (year/month partitions keep pair counts
    * quadratic in a CONSTANT), or sample pairs; the per-partition
    * window sort is the q42 rank-selection discipline. Overflow:
    * |r|·10⁶ ≤ 10¹⁵ for 10⁹-cent days — safe for any realistic SF. */
  def q289TheilSen(spark: SparkSession, dir: String): DataFrame = {
    val d = load(spark, dir, "orders")
      .groupBy(expr("CAST(year(o_orderdate) AS BIGINT)").as("yr"),
        datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
          .cast("long").as("dnum"))
      .agg(sum(expr(
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")).as("r"))
    val wY = Window.partitionBy("yr")
    val slope = d.as("a").join(d.as("b"),
        col("a.yr") === col("b.yr") && col("a.dnum") < col("b.dnum"))
      .select(col("a.yr").as("yr"), col("a.dnum").as("da"),
        col("b.dnum").as("db"), col("a.r").as("ra"),
        col("b.r").as("rb"))
      .withColumn("slope_e6",
        expr("((rb - ra) * 1000000) div (db - da)"))
      .withColumn("rn", row_number().over(
        wY.orderBy(col("slope_e6"), col("da"), col("db"))))
      .withColumn("np", count(lit(1)).over(wY))
      .filter(col("rn") === expr("(np + 1) div 2"))
      .select(col("yr"), col("np").as("n_pairs"), col("slope_e6"))
    d.join(slope, "yr")
      .withColumn("iv", expr("r * 1000000 - slope_e6 * dnum"))
      .withColumn("rn", row_number().over(
        wY.orderBy(col("iv"), col("dnum"))))
      .withColumn("nd", count(lit(1)).over(wY))
      .filter(col("rn") === expr("(nd + 1) div 2"))
      .select(col("yr"), col("nd").as("n_days"), col("n_pairs"),
        col("slope_e6"), col("iv").as("intercept_e6"))
      .orderBy("yr")
  }

  // ---------------------------------------------------------------- q295

  /** Q295: DETERMINISTIC PAIR-SAMPLED THEIL–SEN — the scale form of
    * q289, gated (round-14 verdict item 4): pairs are kept iff the
    * md5 nibble of the (da, db) key lands in the first 4 of 16 buckets
    * (the q46/q103 hash-sample discipline — membership is a pure
    * function of the pair, stable across runs/engines/partitionings),
    * rate 1/4; the median-of-slopes machinery is identical. The output
    * carries BOTH estimates and their delta, so the fixture MEASURES
    * the sampling error q289's prose could only assert is small
    * (median-of-pairs is robust to uniform pair thinning).
    *
    * Scale: the sample predicate is a codegen'd projection applied
    * BEFORE the rank shuffle — pair generation stays O(days²) compute
    * per partition, but the shuffled/sorted volume (the expensive
    * stage at the rank-selection step) drops by the rate; at 100 TB
    * combine with the bounded-window partitioning (q289's note) and
    * tighten the rate as windows widen. */
  def q295TheilSenSampled(spark: SparkSession, dir: String)
      : DataFrame = {
    val d = load(spark, dir, "orders")
      .groupBy(expr("CAST(year(o_orderdate) AS BIGINT)").as("yr"),
        datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
          .cast("long").as("dnum"))
      .agg(sum(expr(
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")).as("r"))
      .localCheckpoint() // both pair builds read this frame
    val wY = Window.partitionBy("yr")
    val pairs = d.as("a").join(d.as("b"),
        col("a.yr") === col("b.yr") && col("a.dnum") < col("b.dnum"))
      .select(col("a.yr").as("yr"), col("a.dnum").as("da"),
        col("b.dnum").as("db"), col("a.r").as("ra"),
        col("b.r").as("rb"))
      .withColumn("slope_e6",
        expr("((rb - ra) * 1000000) div (db - da)"))
    def discSlope(p: DataFrame, nName: String, sName: String)
        : DataFrame =
      p.withColumn("rn", row_number().over(
          wY.orderBy(col("slope_e6"), col("da"), col("db"))))
        .withColumn("np", count(lit(1)).over(wY))
        .filter(col("rn") === expr("(np + 1) div 2"))
        .select(col("yr"), col("np").as(nName),
          col("slope_e6").as(sName))
    val full = discSlope(pairs, "n_pairs_full", "slope_full_e6")
    val samp = discSlope(
      pairs.filter(Sampling.md5Bucket(
          concat_ws("_", col("da"), col("db")))
        .isin("0", "1", "2", "3")),
      "n_pairs_sampled", "slope_sampled_e6")
    full.join(samp, "yr")
      .select(col("yr"), col("n_pairs_full"), col("n_pairs_sampled"),
        col("slope_full_e6"), col("slope_sampled_e6"),
        (col("slope_sampled_e6") - col("slope_full_e6"))
          .as("delta_e6"))
      .orderBy("yr")
  }

  // ---------------------------------------------------------------- q290

  /** Q290: MANN–KENDALL TREND TEST per order year — the significance
    * companion of q289's Theil–Sen slope (Mann 1945 / Kendall 1975,
    * public; the pair is the standard robust-trend toolkit):
    * S = Σ sign(r_j − r_i) over day pairs i < j, and the tie-corrected
    * variance scaled ×18 to stay integer:
    * var18 = n(n−1)(2n+5) − Σ_ties t(t−1)(2t+5). Both outputs are
    * exact BIGINT — the z-score (S±1)/√(var18/18) is one driver-side
    * IEEE step a consumer applies, kept OUT of the gate (the q13
    * estimator discipline). |S| near n(n−1)/2 = monotone revenue
    * growth; S near 0 = no trend.
    *
    * Scale: same O(days²)-per-partition pair frame as q289 (bounded
    * windows at 100 TB); the tie census is a days-sized rollup. */
  def q290MannKendall(spark: SparkSession, dir: String): DataFrame = {
    val d = load(spark, dir, "orders")
      .groupBy(expr("CAST(year(o_orderdate) AS BIGINT)").as("yr"),
        datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
          .cast("long").as("dnum"))
      .agg(sum(expr(
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")).as("r"))
      .localCheckpoint() // pairs AND tie census read it
    val s = d.as("a").join(d.as("b"),
        col("a.yr") === col("b.yr") && col("a.dnum") < col("b.dnum"))
      .select(col("a.yr").as("yr"),
        signum(col("b.r") - col("a.r")).cast("long").as("sg"))
      .groupBy("yr")
      .agg(sum(col("sg")).as("s_stat"), count(lit(1)).as("n_pairs"))
    val ties = d.groupBy("yr", "r").agg(count(lit(1)).as("t"))
      .groupBy("yr")
      .agg(count(lit(1)).as("n_distinct"), sum(col("t")).as("n_days"),
        sum(expr("t * (t - 1) * (2 * t + 5)")).as("tiecorr"))
    s.join(ties, "yr")
      .select(col("yr"), col("n_days"), col("n_pairs"), col("s_stat"),
        expr("n_days * (n_days - 1) * (2 * n_days + 5) - tiecorr")
          .as("var18"))
      .orderBy("yr")
  }

  // ---------------------------------------------------------------- q292

  /** Q292: SPEARMAN RANK CORRELATION between every PAIR of event-type
    * daily-count series (Spearman 1904) — the robust (monotone-
    * invariant) sibling of q201's Pearson matrix: outlier days move
    * ranks by at most one step where they drag Pearson arbitrarily.
    * Integer throughout: ranks are ROW_NUMBER under the total order
    * (count, day) — the deterministic untied-rank convention, stated,
    * not the average-tied-rank variant (which needs fractional ranks;
    * both are standard, ours is engine-exact) — and the output is the
    * exact pair (sum_d2_6x = 6·Σd², denom = n(n²−1)); the one IEEE
    * step ρ = 1 − sum_d2_6x/denom stays driver-side (the q13
    * estimator rule, as q290 leaves z to the consumer).
    *
    * RANK SCOPE (advice r13): ranks are computed WITHIN each pair's
    * joined common-day sample — join the two daily series on day
    * first, THEN rank each side inside the (type_a, type_b) partition.
    * Ranking each type over its own full active-day set and joining
    * after is only a permutation of 1..n when both types share every
    * day (true on this dense fixture, false in general — ρ could
    * leave [−1, 1]). The within-sample form keeps the driver-side
    * formula valid for ANY day coverage.
    *
    * Scale: the pair join fans |types|²/2 · days slim rows; both rank
    * windows share one (type_a, type_b) partitioning — one shuffle,
    * two in-partition sorts. */
  def q292Spearman(spark: SparkSession, dir: String): DataFrame = {
    val d = graft.Tables.events(spark, dir)
      .groupBy(col("event_type"),
        expr("unix_date(to_date(ts))").as("dnum"))
      .agg(count(lit(1)).as("c"))
    val pw = Window.partitionBy("type_a", "type_b")
    d.as("a").join(d.as("b"),
        col("a.dnum") === col("b.dnum")
          && col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"),
        col("a.dnum").as("dnum"),
        col("a.c").as("ca"), col("b.c").as("cb"))
      .withColumn("rka",
        row_number().over(pw.orderBy(col("ca"), col("dnum"))).cast("long"))
      .withColumn("rkb",
        row_number().over(pw.orderBy(col("cb"), col("dnum"))).cast("long"))
      .select(col("type_a"), col("type_b"),
        ((col("rka") - col("rkb")) * (col("rka") - col("rkb"))).as("d2"))
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("n_days"),
        (sum(col("d2")) * lit(6L)).as("sum_d2_6x"))
      .select(col("type_a"), col("type_b"), col("n_days"),
        col("sum_d2_6x"),
        expr("n_days * (n_days * n_days - 1)").as("denom"))
      .orderBy("type_a", "type_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q292_spearman" -> (q292Spearman _),
    "q290_mann_kendall" -> (q290MannKendall _),
    "q289_theil_sen" -> (q289TheilSen _),
    "q295_theil_sen_sampled" -> (q295TheilSenSampled _),
    "q224_repeat_latency" -> (q224RepeatLatency _),
    "q222_peak_rate" -> (q222PeakRate _),
    "q203_seasonal_residuals" -> (q203SeasonalResiduals _),
    "q179_seasonal_adjust" -> (q179SeasonalAdjust _),
    "q172_acf" -> (q172Acf _),
    "q173_corr_matrix" -> (q173CorrMatrix _),
    "q165_cusum_changepoint" -> (q165CusumChangepoint _),
    "q161_fano_factor" -> (q161FanoFactor _),
    "q157_dow_seasonality" -> (q157DowSeasonality _),
    "q54_gapfill" -> (q54GapFill _),
    "q97_scd2" -> (q97Scd2 _),
    "q100_concurrency" -> (q100Concurrency _),
    "q127_arrival_gaps" -> (q127ArrivalGaps _),
    "q136_ohlc" -> (q136Ohlc _),
  )

  val oracle: Map[String, String] = Map(
    // q292: untied ROW_NUMBER ranks under (count, day) WITHIN each
    // pair's joined common-day sample (advice r13 — valid Spearman for
    // any day coverage), exact 6·Σd² and n(n²−1); ρ stays driver-side
    // (the q13/q290 rule).
    "q292_spearman" ->
      """WITH d AS (
        |  SELECT event_type,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS dnum,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |j AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    a.dnum AS dnum, a.c AS ca, b.c AS cb
        |  FROM d a JOIN d b
        |    ON a.dnum = b.dnum AND a.event_type < b.event_type),
        |p AS (
        |  SELECT type_a, type_b,
        |    (CAST(ROW_NUMBER() OVER (PARTITION BY type_a, type_b
        |        ORDER BY ca, dnum) AS BIGINT)
        |     - CAST(ROW_NUMBER() OVER (PARTITION BY type_a, type_b
        |        ORDER BY cb, dnum) AS BIGINT)) AS dd
        |  FROM j),
        |s AS (
        |  SELECT type_a, type_b, CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(SUM(dd * dd) * 6 AS BIGINT) AS sum_d2_6x
        |  FROM p GROUP BY 1, 2)
        |SELECT type_a, type_b, n_days, sum_d2_6x,
        |  n_days * (n_days * n_days - 1) AS denom
        |FROM s ORDER BY type_a, type_b""".stripMargin,
    // q295: same cents/day/slope chain as q289, one shared pair CTE;
    // the sampled leg filters on the md5 nibble of 'da_db' (the
    // q46 hash-sample rendering) before the same rank selection.
    "q295_theil_sen_sampled" ->
      """WITH d AS MATERIALIZED (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |    CAST(datediff('day', DATE '1970-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS dnum,
        |    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS r
        |  FROM orders GROUP BY 1, 2),
        |p AS MATERIALIZED (
        |  SELECT a.yr, a.dnum AS da, b.dnum AS db,
        |    ((b.r - a.r) * 1000000) // (b.dnum - a.dnum) AS slope_e6
        |  FROM d a JOIN d b ON a.yr = b.yr AND a.dnum < b.dnum),
        |f AS (
        |  SELECT yr, np AS n_pairs_full, slope_e6 AS slope_full_e6
        |  FROM (
        |    SELECT yr, slope_e6, ROW_NUMBER() OVER (
        |        PARTITION BY yr ORDER BY slope_e6, da, db) AS rn,
        |      COUNT(*) OVER (PARTITION BY yr) AS np
        |    FROM p) t WHERE rn = (np + 1) // 2),
        |sp AS (
        |  SELECT yr, np AS n_pairs_sampled,
        |    slope_e6 AS slope_sampled_e6
        |  FROM (
        |    SELECT yr, slope_e6, ROW_NUMBER() OVER (
        |        PARTITION BY yr ORDER BY slope_e6, da, db) AS rn,
        |      COUNT(*) OVER (PARTITION BY yr) AS np
        |    FROM p
        |    WHERE substring(md5(CAST(da AS VARCHAR) || '_' ||
        |      CAST(db AS VARCHAR)), 32, 1) IN ('0', '1', '2', '3'))
        |    t WHERE rn = (np + 1) // 2)
        |SELECT f.yr, n_pairs_full, n_pairs_sampled, slope_full_e6,
        |  slope_sampled_e6,
        |  slope_sampled_e6 - slope_full_e6 AS delta_e6
        |FROM f JOIN sp USING (yr) ORDER BY yr""".stripMargin,
    // q290: S = pairwise sign sum; var18 = the tie-corrected variance
    // numerator (×18 keeps it integer); z stays driver-side (q13 rule).
    "q290_mann_kendall" ->
      """WITH d AS MATERIALIZED (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |    CAST(datediff('day', DATE '1970-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS dnum,
        |    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS r
        |  FROM orders GROUP BY 1, 2),
        |s AS (
        |  SELECT a.yr, CAST(SUM(CASE WHEN b.r > a.r THEN 1
        |      WHEN b.r < a.r THEN -1 ELSE 0 END) AS BIGINT) AS s_stat,
        |    CAST(COUNT(*) AS BIGINT) AS n_pairs
        |  FROM d a JOIN d b ON a.yr = b.yr AND a.dnum < b.dnum
        |  GROUP BY a.yr),
        |tg AS (SELECT yr, r, CAST(COUNT(*) AS BIGINT) AS t
        |       FROM d GROUP BY yr, r),
        |ties AS (
        |  SELECT yr, CAST(SUM(t) AS BIGINT) AS n_days,
        |    CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tiecorr
        |  FROM tg GROUP BY yr)
        |SELECT s.yr, ties.n_days, s.n_pairs, s.s_stat,
        |  ties.n_days * (ties.n_days - 1) * (2 * ties.n_days + 5)
        |    - ties.tiecorr AS var18
        |FROM s JOIN ties ON ties.yr = s.yr
        |ORDER BY s.yr""".stripMargin,
    // q289: integer cents, truncating-div slopes, disc-median rank
    // selection under the (slope_e6, da, db) / (iv, dnum) total orders.
    "q289_theil_sen" ->
      """WITH d AS MATERIALIZED (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |    CAST(datediff('day', DATE '1970-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS dnum,
        |    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS r
        |  FROM orders GROUP BY 1, 2),
        |p AS MATERIALIZED (
        |  SELECT a.yr, a.dnum AS da, b.dnum AS db,
        |    ((b.r - a.r) * 1000000) // (b.dnum - a.dnum) AS slope_e6
        |  FROM d a JOIN d b ON a.yr = b.yr AND a.dnum < b.dnum),
        |sl AS (
        |  SELECT yr, np AS n_pairs, slope_e6 FROM (
        |    SELECT yr, slope_e6,
        |      ROW_NUMBER() OVER (PARTITION BY yr
        |        ORDER BY slope_e6, da, db) AS rn,
        |      CAST(COUNT(*) OVER (PARTITION BY yr) AS BIGINT) AS np
        |    FROM p) t WHERE rn = (np + 1) // 2),
        |ic AS (
        |  SELECT yr, nd AS n_days, n_pairs, slope_e6,
        |    iv AS intercept_e6 FROM (
        |    SELECT d.yr, sl.n_pairs, sl.slope_e6,
        |      d.r * 1000000 - sl.slope_e6 * d.dnum AS iv,
        |      ROW_NUMBER() OVER (PARTITION BY d.yr
        |        ORDER BY d.r * 1000000 - sl.slope_e6 * d.dnum, d.dnum)
        |        AS rn,
        |      CAST(COUNT(*) OVER (PARTITION BY d.yr) AS BIGINT) AS nd
        |    FROM d JOIN sl ON sl.yr = d.yr) t
        |  WHERE rn = (nd + 1) // 2)
        |SELECT yr, n_days, n_pairs, slope_e6, intercept_e6
        |FROM ic ORDER BY yr""".stripMargin,
    // q224: same (orderdate, orderkey) per-customer order, same
    // day-number differencing, quantile_disc = discByRank boundary
    // definition (the q42/q101 pin).
    "q224_repeat_latency" ->
      """WITH g AS (
        |  SELECT o_custkey,
        |    datediff('day', DATE '1970-01-01',
        |        CAST(o_orderdate AS DATE))
        |      - LAG(datediff('day', DATE '1970-01-01',
        |          CAST(o_orderdate AS DATE))) OVER (
        |        PARTITION BY o_custkey
        |        ORDER BY o_orderdate, o_orderkey) AS gap_days
        |  FROM orders)
        |SELECT c_mktsegment, COUNT(*) AS n_gaps,
        |  quantile_disc(gap_days, 0.5) AS p50_days,
        |  quantile_disc(gap_days, 0.9) AS p90_days
        |FROM g JOIN customer ON o_custkey = c_custkey
        |WHERE gap_days IS NOT NULL
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    // q222: same minute bucketing (epoch-ns div 60e9), same
    // (count desc, minute asc) argmax, same cross-multiplied ratios.
    "q222_peak_rate" ->
      """WITH m AS (
        |  SELECT event_type, epoch_ns(ts) // 60000000000 AS minute,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |pk AS (
        |  SELECT event_type, minute AS peak_minute, c AS peak_per_min
        |  FROM (
        |    SELECT event_type, minute, c, ROW_NUMBER() OVER (
        |      PARTITION BY event_type ORDER BY c DESC, minute) AS rn
        |    FROM m) WHERE rn = 1),
        |agg AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT)
        |      AS n_active_minutes,
        |    CAST(SUM(c) AS BIGINT) AS n_events
        |  FROM m GROUP BY 1)
        |SELECT a.event_type, a.n_active_minutes, a.n_events,
        |  p.peak_per_min, p.peak_minute,
        |  (a.n_events * 1000) // a.n_active_minutes
        |    AS mean_per_min_e3,
        |  (p.peak_per_min * a.n_active_minutes * 1000) // a.n_events
        |    AS burst_x1000
        |FROM agg a JOIN pk p USING (event_type)
        |ORDER BY event_type""".stripMargin,
    // q203: same dnum-7 seasonal self-join, same quantile_disc
    // median/MAD (the q101 boundary definition), integer throughout.
    "q203_seasonal_residuals" ->
      """WITH d AS (
        |  SELECT event_type,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS dnum,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT a.event_type, a.dnum, a.c - b.c AS resid
        |  FROM d a JOIN d b
        |    ON a.event_type = b.event_type AND a.dnum = b.dnum + 7),
        |med AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        |    quantile_disc(resid, 0.5) AS med
        |  FROM r GROUP BY event_type),
        |dev AS (
        |  SELECT r.event_type, m.n_days, m.med,
        |    abs(r.resid - m.med) AS adev
        |  FROM r JOIN med m USING (event_type)),
        |mad AS (
        |  SELECT event_type, quantile_disc(adev, 0.5) AS mad
        |  FROM dev GROUP BY event_type)
        |SELECT d.event_type, MAX(d.n_days) AS n_days,
        |  MAX(d.med) AS med, MAX(m.mad) AS mad,
        |  CAST(SUM(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_anomalies
        |FROM dev d JOIN mad m USING (event_type)
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,
    // q179: same arithmetic weekday, same cross-multiplied ppm
    // deviation (signed // truncates identically), same
    // (|dev| desc, day) rank order.
    "q179_seasonal_adjust" ->
      """WITH d AS (
        |  SELECT event_type,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS dnum,
        |    COUNT(*) AS c
        |  FROM events GROUP BY 1, 2),
        |dd AS (
        |  SELECT event_type, dnum, c, (dnum + 3) % 7 + 1 AS dow
        |  FROM d),
        |m AS (
        |  SELECT event_type, dow, COUNT(*) AS n_dow,
        |    CAST(SUM(c) AS BIGINT) AS sum_dow
        |  FROM dd GROUP BY 1, 2),
        |x AS (
        |  SELECT dd.event_type, dd.dnum, dd.dow, dd.c,
        |    ((dd.c * m.n_dow - m.sum_dow) * 1000000) // m.sum_dow
        |      AS dev_ppm
        |  FROM dd JOIN m
        |    ON m.event_type = dd.event_type AND m.dow = dd.dow),
        |r AS (
        |  SELECT event_type, dnum, dow, c, dev_ppm,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY abs(dev_ppm) DESC, dnum) AS rank
        |  FROM x)
        |SELECT event_type, CAST(rank AS BIGINT) AS rank, dnum, dow, c,
        |  dev_ppm
        |FROM r WHERE rank <= 3 ORDER BY event_type, rank""".stripMargin,
    // q172/q173: identical integer sums, identical final IEEE sequence
    // (cast, multiply, sqrt, divide, floor-round) — the q92 rule.
    "q172_acf" ->
      """WITH d AS (
        |  SELECT event_type,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS dnum,
        |    COUNT(*) AS c
        |  FROM events GROUP BY 1, 2),
        |a AS (
        |  SELECT d.event_type, CAST(l.lag AS BIGINT) AS lag,
        |    d.dnum + l.lag AS dn2, d.c AS x
        |  FROM d, (SELECT unnest(generate_series(1, 7)) AS lag) l),
        |p AS (
        |  SELECT a.event_type, a.lag, a.x, b.c AS y
        |  FROM a JOIN d b
        |    ON b.event_type = a.event_type AND b.dnum = a.dn2),
        |s AS (
        |  SELECT event_type, lag, COUNT(*) AS n_pairs,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(y * y) AS BIGINT) AS syy
        |  FROM p GROUP BY 1, 2),
        |v AS (
        |  SELECT event_type, lag, n_pairs,
        |    n_pairs * sxy - sx * sy AS num,
        |    n_pairs * sxx - sx * sx AS varx,
        |    n_pairs * syy - sy * sy AS vary
        |  FROM s)
        |SELECT event_type, lag, n_pairs,
        |  CAST(floor(CAST(num AS DOUBLE) /
        |    sqrt(CAST(varx AS DOUBLE) * CAST(vary AS DOUBLE))
        |    * 1000000 + 0.5) AS BIGINT) AS acf_e6
        |FROM v WHERE varx > 0 AND vary > 0
        |ORDER BY event_type, lag""".stripMargin,
    "q173_corr_matrix" ->
      """WITH d AS (
        |  SELECT event_type,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS dnum,
        |    COUNT(*) AS c
        |  FROM events GROUP BY 1, 2),
        |p AS (
        |  SELECT a.event_type AS ta, b.event_type AS tb,
        |    a.c AS x, b.c AS y
        |  FROM d a JOIN d b
        |    ON a.dnum = b.dnum AND a.event_type < b.event_type),
        |s AS (
        |  SELECT ta, tb, COUNT(*) AS n_days,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(y * y) AS BIGINT) AS syy
        |  FROM p GROUP BY 1, 2),
        |v AS (
        |  SELECT ta, tb, n_days,
        |    n_days * sxy - sx * sy AS num,
        |    n_days * sxx - sx * sx AS varx,
        |    n_days * syy - sy * sy AS vary
        |  FROM s)
        |SELECT ta, tb, n_days,
        |  CAST(floor(CAST(num AS DOUBLE) /
        |    sqrt(CAST(varx AS DOUBLE) * CAST(vary AS DOUBLE))
        |    * 1000000 + 0.5) AS BIGINT) AS corr_e6
        |FROM v WHERE varx > 0 AND vary > 0
        |ORDER BY ta, tb""".stripMargin,
    // q165: same scaled-CUSUM prefix statistic; argmax = ROW_NUMBER
    // under (|c| desc, day asc) ≡ min(struct(-|c|, day)).
    "q165_cusum_changepoint" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, d,
        |    CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS p,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY d) AS BIGINT) AS k,
        |    CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT)
        |      AS s,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
        |      AS dd
        |  FROM daily),
        |r AS (
        |  SELECT event_type, dd AS n_days, s AS n_events,
        |    d AS peak_day, abs(dd * p - k * s) AS cusum_peak,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY abs(dd * p - k * s) DESC, d) AS rn
        |  FROM w)
        |SELECT event_type, n_days, n_events, peak_day, cusum_peak
        |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin,
    // q161: same daily counts, same integer power-sum dispersion.
    "q161_fano_factor" ->
      """WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |a AS (
        |  SELECT event_type, COUNT(*) AS n_days,
        |    CAST(SUM(n) AS BIGINT) AS s,
        |    CAST(SUM(n * n) AS BIGINT) AS q
        |  FROM d GROUP BY event_type)
        |SELECT event_type, n_days, s AS n_events,
        |  CASE WHEN n_days > 1 AND s > 0
        |       THEN ((n_days * q - s * s) * 1000000)
        |            // ((n_days - 1) * s)
        |       ELSE CAST(0 AS BIGINT) END AS fano_ppm
        |FROM a ORDER BY event_type""".stripMargin,
    // q157: same arithmetic weekday (date minus epoch is integer days
    // in DuckDB), same integer margins.
    "q157_dow_seasonality" ->
      """WITH c AS (
        |  SELECT event_type,
        |    (CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) + 3)
        |      % 7 + 1 AS dow,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, dow, n,
        |    CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT)
        |      AS total
        |  FROM c)
        |SELECT event_type, dow, n, n * 7 - total AS excess7,
        |  (n * 7 * 1000000) // total AS ratio_ppm
        |FROM m ORDER BY event_type, dow""".stripMargin,
    // q136: identical two-direction row_number selection under the
    // (µs, event_id) in-bar order; CAST(ts AS DATE) ≡ to_date under the
    // UTC session.
    "q136_ohlc" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    epoch_us(ts) AS ts_us, event_id, value
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY event_type, day
        |      ORDER BY ts_us, event_id) AS rn,
        |    row_number() OVER (PARTITION BY event_type, day
        |      ORDER BY ts_us DESC, event_id DESC) AS rr
        |  FROM ev)
        |SELECT event_type, day, COUNT(*) AS n_events,
        |  MAX(CASE WHEN rn = 1 THEN value END) AS open,
        |  MAX(value) AS high, MIN(value) AS low,
        |  MAX(CASE WHEN rr = 1 THEN value END) AS close
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q127_arrival_gaps" ->
      """WITH g AS (
        |  SELECT event_type,
        |    epoch_us(ts) - LAG(epoch_us(ts)) OVER (
        |      PARTITION BY user_id, event_type
        |      ORDER BY ts, event_id) AS gap_us
        |  FROM events)
        |SELECT event_type, COUNT(*) AS n_gaps,
        |  quantile_disc(gap_us, 0.5) AS p50_gap_us,
        |  quantile_disc(gap_us, 0.9) AS p90_gap_us,
        |  quantile_disc(gap_us, 0.99) AS p99_gap_us
        |FROM g WHERE gap_us IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q97_scd2" ->
      """SELECT o_custkey,
        |  CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
        |  o_orderkey,
        |  CAST(o_orderdate AS DATE) AS valid_from,
        |  LEAD(CAST(o_orderdate AS DATE), 1) OVER w AS valid_to,
        |  CAST(CASE WHEN LEAD(o_orderdate, 1) OVER w IS NULL
        |    THEN 1 ELSE 0 END AS BIGINT) AS is_current
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, version""".stripMargin,
    "q100_concurrency" ->
      """WITH days AS (
        |  SELECT datediff('day', DATE '1970-01-01',
        |    CAST(l_shipdate AS DATE)) AS dn
        |  FROM lineitem),
        |deltas AS (
        |  SELECT dn, CAST(SUM(dl) AS BIGINT) AS delta FROM (
        |    SELECT dn, 1 AS dl FROM days
        |    UNION ALL SELECT dn + 15, -1 FROM days)
        |  GROUP BY dn),
        |curve AS (
        |  SELECT dn, CAST(SUM(delta) OVER (ORDER BY dn
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS conc
        |  FROM deltas)
        |SELECT CAST(date_trunc('month',
        |    DATE '1970-01-01' + dn * INTERVAL 1 DAY) AS DATE) AS month,
        |  MAX(conc) AS peak
        |FROM curve GROUP BY 1 ORDER BY 1""".stripMargin,
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
