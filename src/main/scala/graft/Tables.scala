package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.DecimalType

/** Parquet table registry for the driver test data (TESTDATA.md) plus the
  * determinism helpers that make Spark-vs-DuckDB hash equality achievable
  * (SURVEY.md §2-B rules D1–D6).
  *
  * Scale notes: single-file-per-table here, but nothing below assumes a
  * single partition — `spark.read.parquet` splits large files by
  * `spark.sql.files.maxPartitionBytes`, so the same code runs a 100 TB
  * multi-file table unchanged.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one table. Column pruning + predicate pushdown reach the scan
    * because we return the raw declarative scan and let Catalyst do the
    * rest (verified via `.explain` → `PushedFilters`/`ReadSchema`). */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** D2 discipline: doubles are money-like 2-decimal values; cast to
    * DECIMAL(18,2) before any SUM so the aggregate is exact and
    * order-independent. INTERNAL ONLY — D6 forbids DECIMAL in a final
    * projection (Spark and DuckDB render trailing zeros/precision
    * differently); final-cast the sum to DOUBLE (exact decimal → identical
    * double on both engines). */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** `events.ts` has shipped in two parquet physical shapes across fixture
    * generations, so the loader branches on the SCANNED schema:
    *   - INT64 TIMESTAMP(NANOS): Spark's vectorized reader rejects it
    *     unless `legacy.parquet.nanosAsLong` is set, under which it scans
    *     as LongType nanos-since-epoch;
    *   - plain `timestamp[us]` (current fixtures): scans as
    *     TIMESTAMP/TIMESTAMP_NTZ directly.
    * Either way the contract downstream is identical — expose BOTH:
    *   - `ts_ns: long` — exact nanosecond value, used for ORDER BY so row
    *     ordering matches engines that keep full ns precision, and
    *   - `ts: timestamp` — micros precision for date/time functions
    *     (session tz is UTC everywhere, so NTZ→TS cast is value-identity).
    * Integer DIV (not `/`) in the nanos branch — nanos ≈ 1.7e18 exceeds
    * double's 2^53 exact range, so float division would corrupt
    * timestamps. micros × 1000L stays well under Long.MaxValue (9.2e18). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros, unix_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    // Declared at session build in Verify/Bench/SparkSpecBase; this
    // guarded set is defensive for externally-built sessions only (it
    // never overwrites an explicit setting, so a long-lived session is
    // not surprised by a table loader mutating its config). Must be set
    // BEFORE the read: a NANOS file fails schema conversion without it.
    if (spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").isEmpty)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType => // INT64-nanos file scanned under nanosAsLong
        raw.withColumn("ts_ns", col("ts").cast("long"))
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case TimestampType | TimestampNTZType => // micros-precision file
        raw.withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
      case other =>
        throw new IllegalStateException(
          s"events.ts fixture drift: scanned type $other is neither " +
            "LongType (INT64-nanos under nanosAsLong) nor " +
            "TIMESTAMP/TIMESTAMP_NTZ (micros file). Regenerate goldens / " +
            "extend Tables.events for the new physical type.")
    }
  }
}
