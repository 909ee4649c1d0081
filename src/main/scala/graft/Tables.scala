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

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read it as a nanos-since-epoch long
    * (legacy.parquet.nanosAsLong) and expose BOTH:
    *   - `ts_ns: long` — exact nanosecond value, used for ORDER BY so row
    *     ordering matches engines that keep full ns precision, and
    *   - `ts: timestamp` — micros truncation for date/time functions.
    * Integer DIV (not `/`) — nanos ≈ 1.7e18 exceeds double's 2^53 exact
    * range, so float division would corrupt timestamps. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Declared at session build in Verify/Bench/SparkSpecBase; this
    // guarded set is defensive for externally-built sessions only (it
    // never overwrites an explicit setting, so a long-lived session is
    // not surprised by a table loader mutating its config).
    if (spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").isEmpty)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts_ns", org.apache.spark.sql.functions.col("ts")
        .cast("long"))
      .withColumn("ts", org.apache.spark.sql.functions
        .timestamp_micros(org.apache.spark.sql.functions
          .expr("ts_ns div 1000")))
  }
}
