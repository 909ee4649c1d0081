package graft

import org.apache.spark.sql.functions._
import graft.operators.{Percentiles, Relational}

/** Rank-selection exact percentiles (round 4): the distributed
  * replacement for Spark's buffering `percentile`/`percentile_disc`
  * aggregates must be BIT-IDENTICAL to the builtins — q42/q61 sit under
  * the DuckDB hash gate, so "close" is not enough. Pins equality on the
  * real fixture AND on adversarial tied/tiny groups, plus the plan
  * property that motivated the swap (window sort, no percentile
  * aggregate buffer).
  */
class PercentileRankSpec extends SparkSpecBase {

  test("contByRank ≡ builtin percentile on lineitem (all fractions)") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val builtin = li.groupBy("l_returnflag")
      .agg(
        percentile(col("l_quantity"), lit(0.5)).as("med_qty"),
        percentile(col("l_quantity"), lit(0.9)).as("p90_qty"),
        percentile(col("l_extendedprice"), lit(0.25)).as("p25_price"))
      .orderBy("l_returnflag").collect()
    val qty = Percentiles.contByRank(li, Seq("l_returnflag"),
      "l_quantity", Seq(0.5 -> "med_qty", 0.9 -> "p90_qty"))
    val price = Percentiles.contByRank(li, Seq("l_returnflag"),
      "l_extendedprice", Seq(0.25 -> "p25_price"))
    val ranked = qty.join(price, Seq("l_returnflag"))
      .orderBy("l_returnflag").collect()
    assert(builtin.length == ranked.length)
    builtin.zip(ranked).foreach { case (b, r) =>
      assert(b.getString(0) == r.getString(0))
      // bit-identical doubles, not approximate
      assert(b.getDouble(1) == r.getDouble(1), "med_qty")
      assert(b.getDouble(2) == r.getDouble(2), "p90_qty")
      assert(b.getDouble(3) == r.getDouble(3), "p25_price")
    }
  }

  test("discByRank ≡ builtin percentile_disc incl. ties and 1-row groups") {
    import spark.implicits._
    // groups: heavy ties, distinct run, singleton, two-element
    val df = Seq(
      ("a", 1.0), ("a", 1.0), ("a", 1.0), ("a", 2.0), ("a", 9.0),
      ("b", 1.0), ("b", 2.0), ("b", 3.0), ("b", 4.0), ("b", 5.0),
      ("c", 7.5),
      ("d", 2.0), ("d", 1.0)
    ).toDF("g", "v")
    val fracs = Seq(0.0 -> "p0", 0.1 -> "p10", 0.2 -> "p20", 0.25 -> "p25",
      0.4 -> "p40", 0.5 -> "p50", 0.6 -> "p60", 0.75 -> "p75",
      0.9 -> "p90", 1.0 -> "p100")
    val builtin = df.groupBy("g").agg(
      fracs.map { case (p, n) =>
        expr(s"percentile_disc($p) WITHIN GROUP (ORDER BY v)").as(n)
      }.head, fracs.map { case (p, n) =>
        expr(s"percentile_disc($p) WITHIN GROUP (ORDER BY v)").as(n)
      }.tail: _*).orderBy("g").collect()
    val mine = Percentiles.discByRank(df, Seq("g"), "v", fracs)
      .orderBy("g").collect()
    builtin.zip(mine).foreach { case (b, m) =>
      (0 until b.length).foreach { i =>
        assert(b.get(i) == m.get(i), s"col $i group ${b.get(0)}")
      }
    }
  }

  test("contByRank ≡ builtin on tied/tiny groups at boundary fractions") {
    import spark.implicits._
    val df = Seq(
      ("a", 1.0), ("a", 1.0), ("a", 3.0), ("a", 3.0),
      ("b", 5.0),
      ("c", 2.0), ("c", 4.0)
    ).toDF("g", "v")
    val fracs = Seq(0.0 -> "p0", 0.25 -> "p25", 0.5 -> "p50",
      (1.0 / 3.0) -> "p33", 1.0 -> "p100")
    val builtin = df.groupBy("g").agg(
      fracs.map { case (p, n) => percentile(col("v"), lit(p)).as(n) }.head,
      fracs.map { case (p, n) => percentile(col("v"), lit(p)).as(n) }
        .tail: _*).orderBy("g").collect()
    val mine = Percentiles.contByRank(df, Seq("g"), "v", fracs)
      .orderBy("g").collect()
    builtin.zip(mine).foreach { case (b, m) =>
      (1 until b.length).foreach { i =>
        assert(b.getDouble(i) == m.getDouble(i),
          s"col $i group ${b.get(0)}")
      }
    }
  }

  test("q42/q61 plans use the bucket-SPLIT rank selection: no " +
      "percentile buffer, and no single task sorts a whole group") {
    val p42 = Relational.q42Percentile(spark, sf)
      .queryExecution.executedPlan.toString
    val p61 = Relational.q61PercentileDisc(spark, sf)
      .queryExecution.executedPlan.toString
    Seq(p42, p61).foreach { p =>
      assert(p.contains("Window"), "rank selection runs on the window op")
      assert(!p.toLowerCase.contains("percentile"),
        "no buffering percentile aggregate anywhere in the plan")
      // width_bucket is the split path's signature: values are range-
      // sliced per group, so the ranking window only ever sorts a hit
      // bucket's ~n/buckets rows — never a whole group in one task
      assert(p.toLowerCase.contains("width_bucket"),
        "expected the bucket-split path (width_bucket range slicing)")
    }
  }

  test("contByRankSplit ≡ contByRank bit-identically on lineitem and " +
      "on degenerate groups (all-equal, singleton, ties), any buckets") {
    import spark.implicits._
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val fracs = Seq(0.25 -> "p25", 0.5 -> "p50", 0.9 -> "p90")
    val whole = Percentiles.contByRank(li, Seq("l_returnflag"),
      "l_extendedprice", fracs, countName = Some("cnt"))
      .orderBy("l_returnflag").collect()
    val split = Percentiles.contByRankSplit(li, Seq("l_returnflag"),
      "l_extendedprice", fracs, buckets = 16, countName = Some("cnt"))
      .orderBy("l_returnflag").collect()
    assert(whole.length == split.length && whole.nonEmpty)
    whole.zip(split).foreach { case (w, s) =>
      (0 until w.length).foreach { i =>
        assert(w.get(i) == s.get(i), s"col $i group ${w.get(0)}")
      }
    }
    val df = (Seq.fill(500)(("a", 7.0)) ++
      Seq(("b", 1.0)) ++
      (1 to 100).map(i => ("c", (i % 4).toDouble)) ++
      (1 to 100).map(i => ("d", i.toDouble))).toDF("g", "v")
    val fr2 = Seq(0.0 -> "p0", (1.0 / 3.0) -> "p33", 0.5 -> "p50",
      1.0 -> "p100")
    val w2 = Percentiles.contByRank(df, Seq("g"), "v", fr2)
      .orderBy("g").collect()
    Seq(2, 8, 1024).foreach { b =>
      val s2 = Percentiles.contByRankSplit(df, Seq("g"), "v", fr2,
        buckets = b).orderBy("g").collect()
      w2.zip(s2).foreach { case (w, s) =>
        (1 until w.length).foreach { i =>
          assert(w.getDouble(i) == s.getDouble(i),
            s"buckets=$b col $i ${w.get(0)}")
        }
      }
    }
  }

  test("split paths reject an empty selection with a descriptive error") {
    import spark.implicits._
    val df = Seq(("a", 1.0)).toDF("g", "v")
    val e1 = intercept[IllegalArgumentException] {
      Percentiles.discByRankSplit(df, Seq("g"), "v", Nil)
    }
    assert(e1.getMessage.contains("fraction"))
    val e2 = intercept[IllegalArgumentException] {
      Percentiles.contByRankSplit(df, Seq("g"), "v", Nil)
    }
    assert(e2.getMessage.contains("fraction"))
    // count-only disc selection is well-defined: per-group counts
    val cnt = Percentiles.discByRankSplit(df, Seq("g"), "v", Nil,
      countName = Some("n")).collect()
    assert(cnt.length == 1 && cnt.head.getLong(1) == 1L)
  }

  test("q42 rank-based matches known golden at sf0.001") {
    val rows = Relational.q42Percentile(spark, sf).collect()
    assert(rows.length == 3)
    // counts per returnflag are stable fixture facts
    assert(rows.map(_.getLong(1)).sum == 6000L)
  }

  test("discByRankSplit ≡ discByRank on lineitem (sub-task parallel " +
      "colossal-group path, advice r5 stretch)") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val fracs = Seq(0.1 -> "p10", 0.5 -> "p50", 0.9 -> "p90",
      0.99 -> "p99")
    val whole = Percentiles.discByRank(li, Seq("l_returnflag"),
      "l_quantity", fracs, countName = Some("cnt"))
      .orderBy("l_returnflag").collect()
    val split = Percentiles.discByRankSplit(li, Seq("l_returnflag"),
      "l_quantity", fracs, buckets = 16, countName = Some("cnt"))
      .orderBy("l_returnflag").collect()
    assert(whole.length == split.length && whole.nonEmpty)
    whole.zip(split).foreach { case (w, s) =>
      (0 until w.length).foreach { i =>
        assert(w.get(i) == s.get(i), s"col $i group ${w.get(0)}")
      }
    }
  }

  test("discByRankSplit survives the degenerate buckets: all-equal " +
      "values, singleton groups, heavy boundary ties, buckets=2") {
    import spark.implicits._
    val df = (Seq.fill(500)(("a", 7.0)) ++ // one bucket only
      Seq(("b", 1.0)) ++ // singleton
      (1 to 100).map(i => ("c", (i % 4).toDouble)) ++ // 4 tied plateaus
      (1 to 100).map(i => ("d", i.toDouble))) // distinct run
      .toDF("g", "v")
    val fracs = Seq(0.0 -> "p0", 0.5 -> "p50", 0.75 -> "p75",
      1.0 -> "p100")
    val whole = Percentiles.discByRank(df, Seq("g"), "v", fracs)
      .orderBy("g").collect()
    Seq(2, 8, 1024).foreach { b =>
      val split = Percentiles.discByRankSplit(df, Seq("g"), "v", fracs,
        buckets = b).orderBy("g").collect()
      whole.zip(split).foreach { case (w, s) =>
        (0 until w.length).foreach { i =>
          assert(w.get(i) == s.get(i), s"buckets=$b col $i ${w.get(0)}")
        }
      }
    }
  }

  test("ntileExpr ≡ builtin ntile for n % k != 0, n % k == 0, and " +
      "n < k (the arithmetic NTILE the split rank path needs)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    for (n <- Seq(3, 10, 23, 40)) {
      val frame = (1 to n).map(i => (i.toLong, (i * 37 % 101).toLong))
        .toDF("id", "v")
      val w = Window.orderBy(col("v").desc, col("id"))
      val builtin = frame
        .withColumn("t", ntile(10).over(w).cast("long"))
        .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(2)))
      val arith = frame
        .withColumn("__rn", row_number().over(w).cast("long"))
        .withColumn("__n", lit(n.toLong))
        .withColumn("t", Percentiles.ntileExpr("__rn", "__n", 10))
        .orderBy("id").collect()
        .map(r => (r.getLong(0), r.getAs[Long]("t")))
      assert(arith.toSeq == builtin.toSeq, s"n=$n")
    }
  }

  test("globalOrderedScan: split path ≡ single-window path bit-exactly " +
      "(rank, running sum, attached scalars) on a frame with duplicate " +
      "order-values broken by id — and the split plan range-partitions") {
    import spark.implicits._
    val frame = (1 to 500)
      .map(i => (i.toLong, (i * 7919 % 83).toLong))
      .toDF("id", "v")
    val order = Seq(col("v").desc, col("id"))
    def run(threshold: Long) = Percentiles.globalOrderedScan(
      frame, order, "rn", cums = Seq("v" -> "cum"),
      nName = Some("n"), totals = Seq("v" -> "tot"),
      splitThreshold = threshold)
    val small = run(1000000L)
    val split = run(10L)
    // the checkpoint pins the range exchange outside the visible plan,
    // so assert the property that matters: the data-sized rank window
    // is __pid-PARTITIONED (each task sorts only its range slice) —
    // the single-window path's row_number has an empty partition spec.
    assert(split.queryExecution.optimizedPlan.toString
        .contains("row_number() windowspecdefinition(__pid"),
      "colossal path must compute the rank per range partition")
    assert(small.queryExecution.optimizedPlan.toString
        .contains("row_number() windowspecdefinition(v"),
      "small path keeps the one-window plan")
    val a = small.orderBy("id").collect().map(_.toSeq)
    val b = split.orderBy("id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  // -------------------------------------- q302 quantile sketch pins

  test("sketchCascade hand golden: 20 values at budget 4 compact to " +
      "{8, 16} at weight 8 (three even-offset halvings, then " +
      "identity rounds — the deterministic MRL collapse computed by " +
      "hand)") {
    import spark.implicits._
    val base = (1L to 20L).map(v => (4L, 0L, v, v, 0L, 1L))
      .toDF("kb", "shard", "v", "ok", "ln", "w")
    val out = Percentiles.sketchCascade(base)
      .select("v", "w").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).toSeq
    // r1: 20 > 4 → even ranks {2,4,…,20} w2; r2: 10 > 4 → {4,8,12,
    // 16,20} w4; r3: 5 > 4 → ranks {2,4} = {8,16} w8; r4..: identity
    assert(out == Seq((8L, 8L), (16L, 8L)), out.toString)
  }

  test("q302b estimator is EXACT whenever no shard compacted (budget " +
      "256 at sf0.001: every shard fits, weights all 1) — rank error " +
      "0 ppm at every quantile; and error weakly shrinks with budget " +
      "in total (the measured sweep's direction)") {
    val rows = Relational.q302bQuantileSketchQuery(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(5)))
    val byKb = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(rows.filter(_._1 == 256L).forall(_._3 == 0L),
      s"uncompacted sketch must answer exactly: ${rows.toSeq}")
    assert(byKb(16L) >= byKb(64L) && byKb(64L) >= byKb(256L),
      s"total rank error should not grow with budget: $byKb")
  }

  test("q302 registers respect the budget: every (kb, shard) " +
      "compactor holds ≤ kb items, and a compacted one holds ≥ kb/2 " +
      "(halving lands in [kb/2, kb] — the size bound the 100 TB " +
      "union-merge story rests on)") {
    val reg = Relational.q302QuantileSketchRegisters(spark, sf)
      .groupBy("kb", "shard")
      .agg(count(lit(1)).as("n"), max(col("weight")).as("wmax"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(reg.nonEmpty)
    reg.foreach { case (kb, shard, n, wmax) =>
      assert(n <= kb, s"shard $shard at budget $kb holds $n > $kb")
      if (wmax > 1L) // compaction happened at least once
        assert(n >= kb / 2,
          s"compacted shard $shard at budget $kb holds only $n")
    }
  }
}
