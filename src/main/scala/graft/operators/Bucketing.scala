package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout — the storage-side half of the 100 TB join
  * story. Every repeated equi-join on the same key (orders ⋈ lineitem
  * on orderkey, events ⋈ users on user_id, doc joins on doc_id) pays a
  * full shuffle of both sides UNLESS the tables are written
  * pre-partitioned by that key: `bucketBy(n, key)` hashes rows into a
  * fixed bucket count at WRITE time, and Spark's scan reports the
  * bucketing as its output partitioning, so sort-merge joins between
  * co-bucketed tables plan with NO Exchange on either side
  * (BucketingSpec pins the plan). At 100 TB this converts the
  * dominant recurring cost of a fact-fact join from
  * O(data shuffled per query) to O(one-time layout at ingest).
  *
  * Bucketed writes require a table catalog (`saveAsTable` — bucket
  * metadata lives in the metastore, not the parquet footer), so this
  * operator manages named tables, not bare paths. Bucket-count choice
  * is the caller's scale knob: buckets ≫ executor count for
  * parallelism, sized so one bucket's working set fits an executor
  * (SCALE.md).
  */
object Bucketing {

  /** Write `df` as a bucketed (and optionally sorted-within-bucket)
    * managed table. Sorting within buckets additionally removes the
    * per-task Sort from sort-merge joins — the scan is then both
    * exchange-free AND sort-free. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, sorted: Boolean = true): Unit = {
    // Pre-shuffle onto the bucket hash (same Murmur3 HashPartitioning
    // the bucket writer uses) so each task owns exactly one bucket and
    // writes ONE file per bucket. Without it every input task writes a
    // sliver of every bucket: reads then see multiple files per bucket,
    // and the sorted-bucket guarantee degrades to sorted-per-FILE —
    // Spark must reinsert the join Sort it was supposed to elide.
    val w = df.repartition(buckets, df.col(key))
      .write.mode(SaveMode.Overwrite)
      .format("parquet").bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  /** Join two co-bucketed tables on their bucket key. With equal
    * bucket counts this plans as a zero-exchange sort-merge join. */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
