package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.Behavioral

/** Behavioral analytics (round 4): hand-computed funnel goldens — the
  * strict ordering rule is the part a naive per-type-min implementation
  * gets wrong — plus cohort conservation laws, and the sf0.001
  * end-to-end shapes.
  */
class BehavioralSpec extends SparkSpecBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("funnel: out-of-order stages do not count") {
    import spark.implicits._
    // u1: full ordered funnel → depth 4
    // u2: viewed BEFORE signup, never after → depth 1
    // u3: signup → view → purchase (no click) → depth 2
    // u4: no signup at all → depth 0
    // u5: signup, view at the SAME instant as signup (>= counts) → 2
    val ev = Seq(
      (1L, "signup", "2024-01-01 10:00:00"),
      (1L, "view", "2024-01-01 10:01:00"),
      (1L, "click", "2024-01-01 10:02:00"),
      (1L, "purchase", "2024-01-01 10:03:00"),
      (2L, "view", "2024-01-01 09:00:00"),
      (2L, "signup", "2024-01-01 09:30:00"),
      (3L, "signup", "2024-01-01 08:00:00"),
      (3L, "view", "2024-01-01 08:10:00"),
      (3L, "purchase", "2024-01-01 08:20:00"),
      (4L, "click", "2024-01-01 07:00:00"),
      (5L, "signup", "2024-01-01 06:00:00"),
      (5L, "view", "2024-01-01 06:00:00")
    ).map { case (u, t, s) => (u, t, ts(s)) }
      .toDF("user_id", "event_type", "ts")
      .withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
    val depths = Behavioral.funnelStages(ev,
      Seq("signup", "view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(depths == Map(1L -> 4L, 2L -> 1L, 3L -> 2L, 4L -> 0L,
      5L -> 2L))
  }

  test("q73 funnel conserves users and depths are within 0..4") {
    val out = Behavioral.q73Funnel(spark, sf).collect()
    val users = graft.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(out.map(_.getLong(1)).sum == users, "every user has one depth")
    assert(out.forall(r => r.getLong(0) >= 0L && r.getLong(0) <= 4L))
  }

  test("q72 cohort: week-0 cell equals cohort size, users conserved") {
    val rows = Behavioral.q72Cohort(spark, sf).collect()
    val events = graft.Tables.events(spark, sf)
    val users = events.select("user_id").distinct().count()
    // every user appears in their cohort's week-0 cell (their first
    // active week IS the cohort week), so the offset-0 column sums to
    // the user count
    val week0 = rows.filter(_.getLong(1) == 0L).map(_.getLong(2)).sum
    assert(week0 == users)
    assert(rows.forall(_.getLong(1) >= 0L), "offsets are non-negative")
  }

  test("q74 transitions conserve pairs: Σn = #events − #active users") {
    val events = graft.Tables.events(spark, sf)
    val out = Behavioral.q74Transitions(spark, sf).collect()
    val nEvents = events.count()
    val nUsers = events.select("user_id").distinct().count()
    // each user's k events contribute exactly k−1 transitions
    assert(out.map(_.getLong(2)).sum == nEvents - nUsers)
  }

  test("funnelTimes are monotone within each user") {
    val t = Behavioral.funnelTimes(graft.Tables.events(spark, sf),
      Seq("signup", "view", "click", "purchase"))
    val bad = t.filter(
      (col("t1").isNotNull && col("t1") < col("t0")) ||
        (col("t2").isNotNull && col("t2") < col("t1")) ||
        (col("t3").isNotNull && col("t3") < col("t2"))).count()
    assert(bad == 0L)
    // a later stage implies the earlier one (strict chain)
    val orphan = t.filter(col("t3").isNotNull && col("t2").isNull).count()
    assert(orphan == 0L)
  }

  test("q84 rfm: cells partition purchasing users; quintiles balanced") {
    val out = Behavioral.rfmSegments(
      graft.Tables.events(spark, sf)).collect()
    val users = out.map(_.getAs[Long]("n_users")).sum
    val purchasers = graft.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(users == purchasers) // every purchasing user in exactly 1 cell
    // quintile scores stay in range
    assert(out.forall { r =>
      Seq("r_q", "f_q", "m_q").forall { c =>
        val v = r.getAs[Long](c); v >= 1 && v <= 5 } })
    // per-axis balance: marginal counts differ by ≤ 1 (ntile law)
    for (axis <- Seq("r_q", "f_q", "m_q")) {
      val marg = out.groupBy(_.getAs[Long](axis))
        .map { case (_, rs) => rs.map(_.getAs[Long]("n_users")).sum }
      assert(marg.max - marg.min <= 1, s"$axis marginals: $marg")
    }
  }

  test("q85 stickiness: bounded by 10000 bp and conserves user-days") {
    val out = Behavioral.stickiness(graft.Tables.events(spark, sf))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val wau = r.getAs[Long]("wau"); val ud = r.getAs[Long]("user_days")
      val bp = r.getAs[Long]("stick_bp")
      assert(ud >= wau)            // each weekly-active user ≥ 1 day
      assert(ud <= wau * 7)        // ≤ 7 days per user
      assert(bp >= 1428 && bp <= 10000) // ≥ 1 day/7 in bp, ≤ all days
    }
    val totalUserDays = out.map(_.getAs[Long]("user_days")).sum
    val expect = graft.Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct().count()
    assert(totalUserDays == expect)
  }

  test("q89 paths: hand-computed journeys, truncation at depth, " +
      "tiebreak by event_id inside one timestamp") {
    import spark.implicits._
    // u1: 6 events — path truncates to the first 5
    // u2: two events in the SAME nanosecond — event_id orders them
    // u3: single event
    val ev = Seq(
      (1L, 101L, "a", 1000L), (1L, 102L, "b", 2000L),
      (1L, 103L, "c", 3000L), (1L, 104L, "d", 4000L),
      (1L, 105L, "e", 5000L), (1L, 106L, "f", 6000L),
      (2L, 201L, "x", 7000L), (2L, 200L, "y", 7000L),
      (3L, 301L, "z", 8000L)
    ).toDF("user_id", "event_id", "event_type", "ts_ns")
    val paths = Behavioral.eventPaths(ev, depth = 5).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(paths == Map("a>b>c>d>e" -> 1L, "y>x" -> 1L, "z" -> 1L))
  }

  test("q89 conserves users and respects the depth bound at sf0.001") {
    val out = Behavioral.q89EventPaths(spark, sf).collect()
    val users = graft.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(out.map(_.getLong(1)).sum == users, "each user has one path")
    assert(out.forall(_.getString(0).split(">").length <= 5))
    // output is (n_users desc, path) ordered
    val keys = out.map(r => (-r.getLong(1), r.getString(0)))
    assert(keys.sameElements(keys.sorted))
  }

  test("q75 median lies within [min, max] and counts full converters") {
    val r = Behavioral.q75TimeToConvert(spark, sf).collect().head
    val nConv = r.getLong(0)
    assert(nConv > 0)
    assert(r.getLong(1) <= r.getLong(2) && r.getLong(2) <= r.getLong(3))
    // n_conv equals the depth-4 bucket of the funnel
    val depth4 = Behavioral.q73Funnel(spark, sf).collect()
      .find(_.getLong(0) == 4L).map(_.getLong(1)).getOrElse(0L)
    assert(nConv == depth4)
  }

  test("q158 session co-occurrence: counts reconcile against the " +
      "session baskets and lift uses the shared total") {
    val b = Behavioral.sessionized(graft.Tables.events(spark, sf))
      .select("user_id", "session_no", "event_type").distinct()
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        r.getString(2)))
    val baskets = b.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val sTotal = baskets.size.toLong
    val typeCount = b.groupBy(_._2).view
      .mapValues(_.map(_._1).toSet.size.toLong).toMap
    val rows = Behavioral.q158SessionCooc(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ta, tb) = (r.getString(0), r.getString(1))
      val co = baskets.values
        .count(s => s.contains(ta) && s.contains(tb)).toLong
      assert(r.getLong(2) == co, s"($ta,$tb) co")
      assert(r.getLong(3) == typeCount(ta))
      assert(r.getLong(4) == typeCount(tb))
      assert(r.getLong(5) ==
        (co * sTotal * 1000000L) / (typeCount(ta) * typeCount(tb)))
    }
  }

  test("q144 rolling WAU == driver-side trailing-7-day distinct count") {
    val ud = graft.Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val days = ud.map(_._2).distinct
    val expect = days.map { ad =>
      ad -> ud.filter { case (_, d) =>
        !d.isAfter(ad) && d.isAfter(ad.minusDays(7))
      }.map(_._1).distinct.length.toLong
    }.toMap
    val got = Behavioral.q144RollingWau(spark, sf).collect()
      .map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    assert(got == expect)
    // sanity: the window is trailing — the first day's WAU equals its
    // own DAU
    val first = days.min(Ordering.by((d: java.time.LocalDate) =>
      d.toEpochDay))
    assert(got(first) ==
      ud.filter(_._2 == first).map(_._1).distinct.length.toLong)
  }

  test("q202 scd2 golden: runs collapse on change only, versions " +
      "restart per user, current run is open (NULL valid_to)") {
    import spark.implicits._
    // u1: signup, signup, view, signup → 3 runs (2, 1, 1 events);
    // u2: one run; same-timestamp pair ordered by event_id.
    val ev = Seq(
      (1L, 11L, "signup", 1000000L), (1L, 12L, "signup", 2000000L),
      (1L, 13L, "view", 3000000L), (1L, 14L, "signup", 4000000L),
      (2L, 21L, "view", 5000000L), (2L, 20L, "view", 5000000L)
    ).toDF("user_id", "event_id", "event_type", "ts_ns")
    val got = Behavioral.scd2Intervals(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (1L, 1L, "signup", 1000L, 3000L, 2L),
      (1L, 2L, "view", 3000L, 4000L, 1L),
      (1L, 3L, "signup", 4000L, -1L, 1L),
      (2L, 1L, "view", 5000L, -1L, 2L)))
  }

  test("q213 steady state matches an independent driver-side integer " +
      "replay of the same 5 rounds (the q93/q140 exact-replay " +
      "discipline)") {
    val trans = Behavioral.q74Transitions(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val states = (trans.map(_._1) ++ trans.map(_._2)).distinct.sorted
    val tot = trans.groupBy(_._1).map { case (s, xs) =>
      s -> xs.map(_._3).sum }
    var pi: Map[String, Long] =
      states.map(_ -> 1000000L / states.length).toMap
    for (_ <- 1 to 5) {
      val next = scala.collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      trans.foreach { case (s, t, c) =>
        pi.get(s).foreach(p => next(t) += (p * c) / tot(s))
      }
      pi = next.toMap
    }
    val got = Behavioral.q213MarkovSteady(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == states.map(s => s -> pi.getOrElse(s, 0L)).toMap)
    // mass only truncates away, never grows
    assert(got.values.sum <= 1000000L)
  }
}
