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
}
