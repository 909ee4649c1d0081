package graft

import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Fixture-drift tripwire (round-5 lesson: the driver regenerated
  * /root/testdata mid-round and events.ts silently changed physical type
  * from INT64 TIMESTAMP(NANOS) to plain timestamp[us], which surfaced as
  * 19 cryptic DATATYPE_MISMATCH failures scattered across five specs).
  * This spec fails FIRST with a message that names the actual scanned
  * type, so the next fixture regeneration is a one-assert diagnosis.
  */
class FixtureGuardSpec extends SparkSpecBase {

  test("events.ts scans as a type Tables.events supports, and the " +
      "loader contract (ts_ns long nanos + ts timestamp micros) holds") {
    val scanned = spark.read.parquet(s"$sf/events.parquet")
      .schema("ts").dataType
    assert(
      scanned == LongType || scanned == TimestampType ||
        scanned == TimestampNTZType,
      s"FIXTURE CHANGED: events.ts now scans as $scanned — " +
        "Tables.events supports INT64-nanos (LongType under nanosAsLong) " +
        "and timestamp[us] (TIMESTAMP/TIMESTAMP_NTZ) only. Extend the " +
        "loader branch and re-check every events-table golden.")

    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts_ns").dataType == LongType)
    assert(ev.schema("ts").dataType == TimestampType)
    // value contract: ts is exactly ts_ns truncated to micros
    val bad = ev.selectExpr("count(*) as n")
      .where("false").count() // force analysis only — cheap
    val mismatch = ev
      .selectExpr("sum(case when unix_micros(ts) * 1000 != ts_ns - ts_ns % 1000 then 1 else 0 end) as m")
      .head().getLong(0)
    assert(mismatch == 0L,
      s"ts/ts_ns drifted apart on $mismatch rows — loader branch broken")
    assert(bad == 0L)
  }

  test("all ten fixture tables load and are non-empty at sf0.001") {
    Tables.names.foreach { n =>
      val df =
        if (n == "events") Tables.events(spark, sf)
        else Tables.load(spark, sf, n)
      assert(df.limit(1).count() == 1L, s"table $n is empty or unreadable")
    }
  }

  test("every SparkEntry query ANALYZES against the current fixtures " +
      "(no execution) — one named failure instead of 19 scattered ones " +
      "when a fixture's physical schema drifts") {
    // Round-5 failure mode: the regenerated events fixture broke 17
    // queries at ANALYSIS time (DATATYPE_MISMATCH), surfacing as
    // cryptic failures across five unrelated specs. Forcing analysis
    // here costs ~50 ms per query and names the broken query directly.
    // Queries whose construction RUNS jobs (memoized pair sets,
    // codebook training, iterative loops) still only pay planning for
    // their FINAL frame; total cost is bounded by the iterative
    // builders, which sf0.001 keeps small.
    val broken = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sf).queryExecution.analyzed; None }
        catch { case e: Throwable =>
          Some(s"$name: ${Option(e.getMessage).getOrElse(e.getClass.getName)
            .linesIterator.take(2).mkString(" / ").take(200)}")
        }
    }
    assert(broken.isEmpty,
      s"${broken.size} queries no longer analyze:\n${broken.mkString("\n")}")
  }

  test("events timestamps are whole microseconds (ts_ns % 1000 == 0) — " +
      "the ordering contract q127/q132 share with the µs-precision " +
      "DuckDB oracle") {
    // The oracle orders by `ts` at microsecond precision. Spark-side
    // orderings tie-break on (µs, event_id); if a fixture regeneration
    // ever ships true sub-µs nanos, floor-of-difference arithmetic and
    // ns-ordering would silently diverge from the oracle — fail HERE
    // with a named message instead (advice r6).
    import org.apache.spark.sql.functions.{col, count, lit, sum, when}
    val bad = Tables.events(spark, sf)
      .agg(sum(when(col("ts_ns") % 1000 =!= 0, lit(1L))
        .otherwise(lit(0L))).as("bad"), count(lit(1)).as("n"))
      .head()
    assert(bad.getLong(1) > 0, "events fixture is empty")
    assert(bad.getLong(0) == 0L,
      s"${bad.getLong(0)} events carry sub-microsecond timestamps: the " +
        "µs-truncation ordering contract (q127/q132 vs the DuckDB " +
        "oracle) no longer holds — re-audit ts_ns orderings/diffs")
  }
}
