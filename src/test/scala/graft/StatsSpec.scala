package graft

import org.apache.spark.sql.functions._

import graft.operators.Stats

/** Statistical aggregates: the exact-power-sum formulations must agree
  * with Spark's own streaming-moment aggregates to float tolerance
  * (they differ only in accumulation error), and the conditional/argmax
  * surface must match a direct recomputation. */
class StatsSpec extends SparkSpecBase {

  test("q51: power-sum stats match Spark's stddev/var/covar/corr/slope") {
    val got = Stats.q51Stats(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    val ref = graft.Tables.load(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(var_samp(col("l_quantity")).as("v"),
        stddev_samp(col("l_quantity")).as("s"),
        covar_samp(col("l_quantity"), col("l_discount")).as("cv"),
        corr(col("l_quantity"), col("l_discount")).as("cr"),
        (covar_samp(col("l_quantity"), col("l_discount")) /
          var_samp(col("l_quantity"))).as("b1"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(got.keySet == ref.keySet)
    got.foreach { case (flag, (v, s, cv, cr, b1)) =>
      val (rv, rs, rcv, rcr, rb1) = ref(flag)
      def close(a: Double, b: Double) =
        math.abs(a - b) <= 1e-6 * math.max(math.abs(b), 1e-9)
      assert(close(v, rv), s"$flag var $v vs $rv")
      assert(close(s, rs), s"$flag std $s vs $rs")
      assert(close(cv, rcv), s"$flag covar $cv vs $rcv")
      assert(close(cr, rcr), s"$flag corr $cr vs $rcr")
      assert(close(b1, rb1), s"$flag slope $b1 vs $rb1")
    }
  }

  test("q55: conditional/argmax aggregates match a direct recomputation") {
    val rows = Stats.q55CondAggs(spark, sf).collect()
    assert(rows.nonEmpty)
    val orders = graft.Tables.load(spark, sf, "orders")
      .select("o_orderpriority", "o_orderkey", "o_custkey", "o_totalprice")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    rows.foreach { r =>
      val prio = r.getString(0)
      val grp = orders.filter(_._1 == prio)
      assert(r.getLong(1) == grp.count(_._4 > 200000), s"$prio n_big")
      assert(r.getLong(2) == (if (grp.forall(_._4 > 0)) 1L else 0L),
        s"$prio all_pos")
      assert(r.getLong(3) == (if (grp.exists(_._4 > 400000)) 1L else 0L),
        s"$prio any_huge")
      assert(r.getLong(4) == grp.maxBy(_._2)._3, s"$prio last_cust")
      assert(r.getLong(5) == grp.minBy(_._2)._3, s"$prio first_cust")
    }
  }

  test("q90: planted extreme value is flagged, the bulk is not, and " +
      "groups do not bleed into each other") {
    import spark.implicits._
    // group p: 29 values of 10 plus one of 1000 (z ≈ 5.4 → outlier);
    // group q: same shape but ALL values equal (σ = 0 → no outliers,
    // and the 1000-vs-10 contrast must not leak across groups)
    val ev = ((1L to 29L).map(i => (i, "p", 10.0)) ++ Seq((30L, "p", 1000.0))
      ++ (31L to 60L).map(i => (i, "q", 7.0)))
      .toDF("event_id", "event_type", "value")
    val out = Stats.valueOutliers(ev, k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == Set(("p", 30L)))
  }

  test("q90 at sf0.001: every flagged event really is > 3σ by an " +
      "independent var_pop recomputation") {
    val events = graft.Tables.events(spark, sf)
    val flagged = Stats.valueOutliers(events).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(flagged.nonEmpty)
    val stats = events.groupBy("event_type")
      .agg(avg(col("value")).as("mu"),
        var_pop(col("value")).as("vp"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1),
        math.sqrt(r.getDouble(2)))).toMap
    val all = events.select(col("event_type"), col("event_id"),
      col("value")).collect()
    all.foreach { r =>
      val (mu, sigma) = stats(r.getString(0))
      val z = math.abs(r.getDouble(2) - mu) / sigma
      val isFlagged = flagged.contains((r.getString(0), r.getLong(1)))
      // 1e-6 guard band: the operator uses exact power sums, the
      // recomputation Spark's streaming moments — boundary rows within
      // float noise of z = 3 are allowed to disagree
      if (z > 3 + 1e-6) assert(isFlagged, s"missed outlier z=$z")
      if (z < 3 - 1e-6) assert(!isFlagged, s"false positive z=$z")
    }
  }

  test("q132: plan is the spill-sort fold — no per-user collect_list " +
      "buffer anywhere in the plan") {
    val plan = Stats.q132Ewma(spark, sf).queryExecution.analyzed.toString
    assert(!plan.toLowerCase.contains("collect_list"),
      "q132 must not materialize a user's history in an agg buffer")
    assert(plan.contains("MapPartitions") || plan.contains("mapPartitions"),
      "expected the streaming mapPartitions fold")
  }

  test("q132: planted hot user folds exactly (driver replay), across a " +
      "many-partition shuffle, with out-of-order input") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    // hot user 1: 5000 events; users 2..40: a handful each; input order
    // scrambled so only the operator's own sort can produce ts order
    val rows = rng.shuffle(
      (1L to 5000L).map(i => (1L, i * 1000L, i, rng.nextDouble() * 50)) ++
      (2L to 40L).flatMap(u => (1L to 7L).map(i =>
        (u, i * 1000L, u * 100 + i, rng.nextDouble() * 50))))
    val df = rows.toDF("user_id", "ts_ns", "event_id", "value")
      .repartition(16)
    val got = Stats.ewmaByUser(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = rows.groupBy(_._1).map { case (u, rs) =>
      val vs = rs.sortBy(r => (r._2, r._3))
        .map(r => math.floor(r._4 * 1000 + 0.5).toLong)
      u -> (vs.size.toLong, vs.foldLeft(0L)(Stats.ewmaStep))
    }
    assert(got == want)
  }

  test("q132: ewmaStep TRUNCATES like DuckDB's measured BIGINT // " +
      "for negative accumulators (round-7 correction)") {
    // Measured in DuckDB 1.0.0, including inside the oracle's
    // list_reduce lambda: (7 * -1 + 0) // 8 = 0 (truncation toward
    // zero), NOT -1 (floor) — the round-6 version of this test pinned
    // floor semantics from the docs' reputation and was wrong. The
    // fold must truncate to stay the oracle's twin on any sign
    // (irrelevant under the FixtureGuardSpec min(value) >= 0 pin,
    // load-bearing the day that pin is relaxed).
    assert(Stats.ewmaStep(-1L, 0L) == 0L)
    assert(Stats.ewmaStep(0L, -9L) == -1L)
    assert(Stats.ewmaStep(0L, 9L) == 1L)
  }

  test("q101 at sf0.001: MAD outlier counts match a driver-side " +
      "median/MAD recomputation") {
    val rows = Stats.q101MadOutliers(spark, sf).collect()
    val ev = graft.Tables.events(spark, sf)
      .select(col("event_type"), col("value"))
      .filter(col("value").isNotNull)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def medDisc(xs: Seq[Double]) = xs(math.ceil(0.5 * xs.size).toInt - 1)
    rows.foreach { r =>
      val xs = ev(r.getString(0))
      val med = medDisc(xs)
      val mad = medDisc(xs.map(x => math.abs(x - med)).sorted)
      assert(r.getDouble(2) == med && r.getDouble(3) == mad)
      assert(r.getLong(4) == xs.count(x => math.abs(x - med) > 3.0 * mad))
    }
    assert(rows.nonEmpty)
  }

  test("q159 Gini == driver recomputation; bounds and degenerate " +
      "cases hold") {
    val got = Stats.q159Gini(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    assert(got.nonEmpty)
    val spend = graft.Tables.load(spark, sf, "orders")
      .groupBy("o_custkey")
      .agg(sum(graft.Tables.dec(col("o_totalprice"))).as("sp"))
      .collect().map(r => r.getLong(0) ->
        (r.getDecimal(1).movePointRight(2).longValueExact())).toMap
    val cust = graft.Tables.load(spark, sf, "customer")
      .select(col("c_custkey"), col("c_nationkey").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    cust.groupBy(_._2).foreach { case (nation, cs) =>
      val cents = cs.map { case (ck, _) => (spend.getOrElse(ck, 0L), ck) }
        .sortBy(identity).map(_._1)
      val n = cents.size.toLong
      val s = cents.sum
      val t = cents.zipWithIndex.map { case (c, i) => (i + 1) * c }.sum
      val gini = if (s > 0) ((2 * t - (n + 1) * s) * 10000L) / (n * s)
      else 0L
      val (gn, gts, gg) = got(nation)
      assert(gn == n && gg == gini, s"nation $nation")
      assert(math.abs(gts - s.toDouble / 100) < 1e-6)
      assert(gg >= 0L && gg < 10000L)
    }
  }

  test("q146 holtStep: truncating division goldens, incl. the " +
      "negative-trend branch where floorDiv would differ") {
    // seed l=100, b=0 then v=0: l' = (0 + 300)/4 = 75,
    // b' = (75 - 100 + 0)/4 = -25/4 → -6 under truncation (-7 under
    // floor — the DuckDB BIGINT `//` measurement pinned in holtStep).
    assert(Stats.holtStep(100L, 0L, 0L) == ((75L, -6L)))
    // rising series keeps a positive trend
    assert(Stats.holtStep(0L, 0L, 100L) == ((25L, 6L)))
  }

  test("q168 top-share == driver recomputation; shares are monotone " +
      "and bounded") {
    val spend = graft.Tables.load(spark, sf, "orders")
      .groupBy("o_custkey")
      .agg(sum(graft.Tables.dec(col("o_totalprice"))).as("sp"))
      .collect().map(r => (r.getLong(0),
        r.getDecimal(1).movePointRight(2).longValueExact()))
    val ranked = spend.sortBy { case (ck, c) => (-c, ck) }.map(_._2)
    val n = ranked.length.toLong
    val tot = ranked.sum
    val got = Stats.q168TopShare(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    Seq(1L, 5L, 10L, 25L).foreach { p =>
      val k = math.max(1L, (n * p) / 100L)
      val share = (ranked.take(k.toInt).sum * 10000L) / tot
      assert(got(p) == ((k, share)), s"pct $p")
      // sound bound: the top k spenders' mean ≥ the overall mean, so
      // their share is at least k/n of revenue (floor-rounded)
      assert(share >= (k * 10000L) / n - 1L,
        s"top-share below its k/n floor at $p%")
    }
    assert(got(1L)._2 <= got(5L)._2 && got(5L)._2 <= got(10L)._2 &&
      got(10L)._2 <= got(25L)._2)
  }

  test("q166 holtBacktest: walk-forward errors == driver replay, " +
      "scored BEFORE each state update") {
    import spark.implicits._
    val daily = Seq(("a", 1, 100L), ("a", 2, 300L), ("a", 3, -50L),
      ("a", 4, -200L), ("b", 1, 40L)).toDF("event_type", "dnum", "v")
    val got = Stats.holtBacktest(daily).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // replay: l=100,b=0 → pred 100 vs 300 (ae 200), step → l=150,
    // b=12; pred 162 vs -50 (ae 212), step → l=109 b=-1... compute
    // via holtStep to avoid hand-arithmetic drift:
    var (l, b) = (100L, 0L)
    var sae = 0L
    Seq(300L, -50L, -200L).foreach { v =>
      sae += math.abs(l + b - v)
      val st = Stats.holtStep(l, b, v); l = st._1; b = st._2
    }
    assert(got("a") == ((3L, sae, sae / 3L)))
    // single-day type: zero predictions, zero error
    assert(got("b") == ((0L, 0L, 0L)))
  }

  test("q146 holtByType: distributed fold == driver replay on a " +
      "planted hot type spanning every shuffle partition") {
    import spark.implicits._
    // hot type: 5000 days with sign-alternating values (exercises the
    // negative-trend branch); cold type: 3 days. Input deliberately
    // shuffled so the repartition+sortWithinPartitions order does the
    // work.
    val hot = (0 until 5000).map(i =>
      ("hot", i, ((i % 7) - 3).toLong * 1000L + i))
    val cold = Seq(("cold", 0, 50L), ("cold", 1, -20L), ("cold", 2, 7L))
    val daily = scala.util.Random.shuffle(hot ++ cold)
      .toDF("event_type", "dnum", "v").repartition(7)
    val got = Stats.holtByType(daily).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    def replay(vs: Seq[Long]): (Long, Long, Long, Long) = {
      var l = 0L; var b = 0L; var n = 0L
      vs.foreach { v =>
        if (n == 0L) { l = v; b = 0L }
        else { val st = Stats.holtStep(l, b, v); l = st._1; b = st._2 }
        n += 1L
      }
      (n, l, b, l + b)
    }
    assert(got("hot") == replay(hot.sortBy(_._2).map(_._3)))
    assert(got("cold") == replay(cold.sortBy(_._2).map(_._3)))
  }

  test("q174 clampedLedger golden: clamp at zero, clamp count, and " +
      "shuffled-input order independence") {
    import spark.implicits._
    // supplier 1: 5, -10 (clamp -> 0), 4, -1, -9 (clamp -> 0):
    //   final 0, 2 clamps, 5 days
    // supplier 2: -3 (clamp on first day), 8: final 8, 1 clamp
    // supplier 3: all positive, never clamps
    val rows = Seq(
      (1L, 10L, 5L), (1L, 11L, -10L), (1L, 12L, 4L), (1L, 13L, -1L),
      (1L, 14L, -9L),
      (2L, 10L, -3L), (2L, 11L, 8L),
      (3L, 10L, 7L), (3L, 11L, 2L))
    val daily = scala.util.Random.shuffle(rows)
      .toDF("l_suppkey", "dnum", "delta").repartition(5)
    val got = Stats.clampedLedger(daily).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == ((5L, 0L, 2L)))
    assert(got(2L) == ((2L, 8L, 1L)))
    assert(got(3L) == ((2L, 9L, 0L)))
  }

  test("q206 feature correlations: |r| bounded by 1e6, n_rows equals " +
      "the lineitem count on every pair row, all three pair names " +
      "present (fixture draws the columns independently, so no sign " +
      "is pinned)") {
    val rows = Stats.q206FeatureCorr(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 3)
    val n = graft.Tables.load(spark, sf, "lineitem").count()
    assert(rows.forall(_._2 == n))
    assert(rows.forall(r => math.abs(r._3) <= 1000000L))
    // fixture note: the synthetic generator draws price independently
    // of quantity, so all three correlations sit near 0 — the spec
    // pins the Cauchy–Schwarz bound and the shared n, the hash oracle
    // pins the exact values.
    assert(rows.map(_._1).sorted.toSeq ==
      Seq("price~disc", "qty~disc", "qty~price"))
  }

  test("q209 lead-time percentiles: p50 <= p90 and monthly line " +
      "counts sum to the join size (fixture note: synthetic ship " +
      "dates can PRECEDE the order date, so negative lead days are " +
      "legitimate data, not a bug)") {
    val rows = Stats.q209LeadTime(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, _, p50, p90) => p50 <= p90 })
    val joined = graft.Tables.load(spark, sf, "lineitem")
      .join(graft.Tables.load(spark, sf, "orders"),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      .count()
    assert(rows.map(_._2).sum == joined)
  }
}
