package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.load

/** AS-OF JOIN — the classic time-series operator Spark's built-ins lack
  * (SURVEY prompt's canonical example): for each left row, attach the
  * latest right row with `right.ts <= left.ts` for the same key. The
  * training-pipeline shape: join events to the config/dimension snapshot
  * in force at event time.
  *
  * Spark-first composition (preference order (a): compose existing ops —
  * no custom SparkPlan needed): tag both sides, union, ONE window pass
  * per key ordered by (ts, side) with rights sorting before lefts at
  * equal ts (that IS the `<=` semantics), carry the right payload forward
  * with `last(..., ignoreNulls)`, keep left rows.
  *
  * Scale: one shuffle on the key + one within-partition sort — same cost
  * as any windowed query; per-key state during the scan is one carried
  * value. Never builds the range-join pair explosion (left × right per
  * key), and a skewed key degrades to a sort, not a cross product.
  * DuckDB spells this natively as `ASOF JOIN` — which is the oracle.
  */
object AsofJoin {

  /** Generic backward as-of join.
    * @param left      left rows, keep all columns
    * @param right     right rows: key, ts, and `valueCols` to attach
    * @param key       equi-join key column name (same on both sides)
    * @param ts        event-time column name (same type both sides)
    * @param valueCols right columns carried onto each left row
    *
    * Right (key, ts) pairs should be unique (dedupe first) — with
    * duplicates the carried value would be ordering-dependent.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      valueCols: Seq[String], strict: Boolean = false): DataFrame = {
    val l = left.withColumn("__side", lit(1))
    val r = right.select((Seq(key, ts).map(col) ++ valueCols.map(col)): _*)
      .withColumn("__side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // At equal ts, rights sort before lefts → `right.ts <= left.ts`
    // semantics; `strict = true` flips the tiebreak so equal-ts rights
    // are excluded (`right.ts < left.ts`).
    val sideOrder = if (strict) col("__side").desc else col("__side").asc
    val w = Window.partitionBy(key)
      .orderBy(col(ts).asc, sideOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(unioned) { case (df, v) =>
      df.withColumn(v, last(col(v), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1).drop("__side")
  }

  /** Hot-key-safe as-of join: identical semantics to `asofJoin` —
    * including per-column `last(…, ignoreNulls)` forward-fill when right
    * value columns contain nulls (round-3 advice: the packed-struct
    * carry diverged there) — but the single per-key window is split into
    * per-(key, time-bucket) windows, so a celebrity key's rows spread
    * across as many reducers as it has buckets instead of serializing
    * one sorting reducer (the round-2 verdict's one remaining as-of
    * scale risk).
    *
    * Mechanics: each bucket's window sees (1) the rights inside the
    * bucket and (2) one synthetic "carry-in" row holding, PER VALUE
    * COLUMN, the latest non-null right value from any STRICTLY earlier
    * bucket — computed by first collapsing rights to one row per
    * (key, bucket) with a conditional `max(struct(ts, v))` per column
    * (max skips nulls, so each column independently remembers its own
    * latest non-null value; map-side combinable), then running the
    * plain as-of at BUCKET granularity (strict variant, itself
    * per-column ignoreNulls), whose per-key partition is bounded by the
    * bucket count, not the row count. Three slim shuffles over
    * key/bucket tuples replace one unbounded per-key sort.
    *
    * `bucket` maps the ts column to a bucket id (e.g.
    * `date_trunc("week", _)` or `floor(_ / 3600)`); any granularity is
    * correct — it only tunes the parallelism/overhead trade.
    * Right (key, ts) pairs should be unique, as in `asofJoin`. */
  def asofJoinBucketed(left: DataFrame, right: DataFrame, key: String,
      ts: String, valueCols: Seq[String],
      bucket: Column => Column): DataFrame = {
    val l = left.withColumn("__b", bucket(col(ts)))
    val r = right.select((Seq(key, ts).map(col) ++ valueCols.map(col)): _*)
      .withColumn("__b", bucket(col(ts)))
    // Latest NON-NULL value per column per (key, bucket): conditional
    // max over (ts, value) structs — exact under the unique-(key, ts)
    // contract, partial-combines map-side, one slim row per (key,
    // bucket) on the shuffle. Per-column (not one packed struct): a
    // right row with a null in one column must not erase another
    // column's carried value.
    val aggs = valueCols.map(v =>
      max(when(col(v).isNotNull, struct(col(ts).as("t"), col(v).as("v"))))
        .as(s"__m_$v"))
    val perBucket = r
      .groupBy(col(key), col("__b"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(key) +: col("__b") +:
        valueCols.map(v => col(s"__m_$v").getField("v").as(s"__c_$v")): _*)
    // Carry-in for every bucket the LEFT actually has: per column, the
    // latest non-null right value from a strictly earlier bucket — the
    // plain as-of join run at bucket granularity (≤ #buckets rows per
    // key, bounded by design; itself per-column ignoreNulls).
    val leftBuckets = l.select(col(key), col("__b")).distinct()
    val carryIn = asofJoin(leftBuckets, perBucket,
      key, "__b", valueCols.map(v => s"__c_$v"), strict = true)
    // Window within (key, bucket): carry-in rows (null ts) sort first,
    // then rights-before-lefts at equal ts — same `<=` semantics as the
    // plain form, but no partition ever exceeds one bucket of one key.
    // Working columns __c_<v>: rights contribute their own values,
    // lefts nulls; each column forward-fills independently.
    val ru = valueCols.foldLeft(r) { case (df, v) =>
      df.withColumn(s"__c_$v", col(v))
    }.drop(valueCols: _*).withColumn("__side", lit(0))
    val cu = carryIn.withColumn("__side", lit(0))
    val lu = l.withColumn("__side", lit(1))
    val unioned = lu.unionByName(ru, allowMissingColumns = true)
      .unionByName(cu, allowMissingColumns = true)
    val w = Window.partitionBy(col(key), col("__b"))
      .orderBy(col(ts).asc_nulls_first, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(unioned) { case (df, v) =>
      df.withColumn(v, last(col(s"__c_$v"), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("__side") === 1)
      .drop(Seq("__side", "__b") ++ valueCols.map(v => s"__c_$v"): _*)
  }

  /** Q37: each event joined to the latest order of the same customer at
    * or before the event time. Right side deduped to unique
    * (custkey, orderdate) via MAX(orderkey) so the as-of value is
    * tie-free on both engines (D1). */
  def q37AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"))
    val ord = load(spark, dir, "orders")
      .groupBy(col("o_custkey").as("user_id"),
        col("o_orderdate").as("ts"))
      .agg(max(col("o_orderkey")).as("asof_ok"))
    asofJoin(ev, ord, "user_id", "ts", Seq("asof_ok"))
      .select(col("event_id"), col("user_id"), col("asof_ok"))
      .orderBy("event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q37_asof_join" -> (q37AsofJoin _),
  )

  val oracle: Map[String, String] = Map(
    "q37_asof_join" ->
      """SELECT e.event_id, e.user_id, o.asof_ok
        |FROM events e ASOF LEFT JOIN (
        |  SELECT o_custkey AS user_id, o_orderdate AS ts,
        |    MAX(o_orderkey) AS asof_ok
        |  FROM orders GROUP BY o_custkey, o_orderdate) o
        |ON e.user_id = o.user_id AND e.ts >= o.ts
        |ORDER BY e.event_id""".stripMargin,
  )
}
