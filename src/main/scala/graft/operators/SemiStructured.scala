package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, MapType, StringType}

import graft.Tables.{dec, load}

/** Semi-structured surface — SURVEY.md §2-B Q27–Q30: time bucketing, JSON
  * scalar extraction, array ops, map ops. All built-in codegen'd
  * expressions; no UDFs in the hot path.
  */
object SemiStructured {

  /** Q27 tumbling window, batch-checkable via date_trunc. The streaming
    * twin (groupBy(window($"ts", "1 hour"))) lives in graft.streaming and
    * is equivalence-tested against this in StreamingSpec. */
  def q27Tumbling(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.events(spark, dir)
      // timestamp_ntz: parquet isAdjustedToUTC=false → Arrow timestamp[us]
      // (naive), exactly what DuckDB's date_trunc produces; plain
      // TimestampType would surface tz-aware and render differently (D6).
      .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(dec(col("value"))).cast("double").as("sv"))
      .orderBy("w", "event_type")

  /** Q27b sliding (hopping) window, batch: Spark's native
    * `window(ts, 1h, 30m)` explodes each event into its width/slide = 2
    * windows; the oracle replicates from first principles (the two
    * 30-minute-aligned candidate starts per event). Window starts are
    * epoch-aligned multiples of the slide on both engines. */
  def q27bSliding(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(dec(col("value"))).cast("double").as("sv"))
      .select(col("window.start").cast("timestamp_ntz").as("w"),
        col("event_type"), col("cnt"), col("sv"))
      .orderBy("w", "event_type")

  /** Q28 JSON scalar extraction (get_json_object → codegen'd path). */
  def q28Json(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(sum(get_json_object(col("props"), "$.k").cast(LongType))
        .as("sum_k"))
      .orderBy("event_type")

  /** Q29 array ops over ArrayType(FloatType) embeddings. */
  def q29Array(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "embeddings")
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        max(size(col("embedding"))).cast(LongType).as("dim"))
      .orderBy("label")

  /** Q30 map ops: parse props into a MapType, then element_at/map_keys.
    * Output avoids projecting the map itself so the result stays
    * SQL-comparable across engines (same aggregate as Q28 plus key count).
    */
  def q30Map(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.events(spark, dir)
      .withColumn("m", from_json(col("props"), MapType(StringType, LongType)))
      .groupBy("event_type")
      .agg(
        // try_element_at: a row whose props lacks "k" yields NULL (matching
        // the oracle's json_extract_string) instead of ANSI
        // MAP_KEY_DOES_NOT_EXIST.
        sum(try_element_at(col("m"), lit("k"))).as("sum_k"),
        max(size(map_keys(col("m")))).cast(LongType).as("max_keys"))
      .orderBy("event_type")

  /** Q35b batch sessionization — the session_window semantics expressed
    * relationally (lag-gap flag + running sum = session number), so it IS
    * hash-checkable against DuckDB, unlike the streaming session_window.
    * Gap threshold compares exact ns integers on the Spark side and
    * ns-precision timestamps in DuckDB — bit-identical boundaries. */
  def q35bSessionize(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val order = Window.partitionBy("user_id").orderBy(col("ts_ns"), col("event_id"))
    val gapNs = 30L * 60 * 1000000000L // 30 minutes in ns
    val flagged = graft.Tables.events(spark, dir)
      .withColumn("prev_ns", lag(col("ts_ns"), 1).over(order))
      .withColumn("new_sess",
        when(col("prev_ns").isNull ||
          col("ts_ns") - col("prev_ns") > gapNs, 1L).otherwise(0L))
    val sess = flagged.withColumn("sess_no",
      sum(col("new_sess")).over(order
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sess.groupBy("user_id", "sess_no")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("user_id", "sess_no")
  }

  /** Q29b wider array surface over word arrays (exact string/int
    * results — D6-safe, unlike float embedding arrays): contains,
    * position, sorted-first, slice+join, distinct count. */
  def q29bArrayFns(spark: SparkSession, dir: String): DataFrame = {
    val ar = split(col("p_name"), " ")
    load(spark, dir, "part")
      .select(col("p_partkey"),
        array_contains(ar, "green").as("has_green"),
        array_position(ar, "green").cast(LongType).as("pos_green"),
        size(ar).cast(LongType).as("n_words"),
        element_at(array_sort(ar), 1).as("first_sorted"),
        array_join(slice(ar, 1, 2), "_").as("first_two"),
        size(array_distinct(ar)).cast(LongType).as("n_distinct"))
      .orderBy("p_partkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q35b_sessionize" -> (q35bSessionize _),
    "q29b_array_fns2" -> (q29bArrayFns _),
    "q27b_sliding" -> (q27bSliding _),
    "q27_tumbling" -> (q27Tumbling _),
    "q28_json" -> (q28Json _),
    "q29_array" -> (q29Array _),
    "q30_map" -> (q30Map _),
  )

  /** DuckDB forms — D5 dialect exceptions: json_extract_string vs
    * get_json_object, len vs size, json_keys for map keys. */
  val oracle: Map[String, String] = Map(
    "q29b_array_fns2" ->
      """SELECT p_partkey,
        |  list_contains(string_split(p_name, ' '), 'green') AS has_green,
        |  CAST(COALESCE(list_position(string_split(p_name, ' '), 'green'), 0)
        |    AS BIGINT) AS pos_green,
        |  CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words,
        |  list_sort(string_split(p_name, ' '))[1] AS first_sorted,
        |  array_to_string(string_split(p_name, ' ')[1:2], '_') AS first_two,
        |  CAST(len(list_distinct(string_split(p_name, ' '))) AS BIGINT)
        |    AS n_distinct
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q35b_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN LAG(ts) OVER w IS NULL
        |           OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, event_id,
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_no
        |  FROM flagged)
        |SELECT user_id, sess_no, COUNT(*) AS cnt FROM sess
        |GROUP BY user_id, sess_no ORDER BY user_id, sess_no""".stripMargin,
    "q27_tumbling" ->
      """SELECT date_trunc('hour', ts) AS w, event_type, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv
        |FROM events GROUP BY date_trunc('hour', ts), event_type
        |ORDER BY w, event_type""".stripMargin,
    "q27b_sliding" ->
      """WITH exploded AS (
        |  SELECT unnest([time_bucket(INTERVAL 30 MINUTE, ts),
        |                 time_bucket(INTERVAL 30 MINUTE, ts)
        |                   - INTERVAL 30 MINUTE]) AS w,
        |    event_type, value
        |  FROM events)
        |SELECT w, event_type, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv
        |FROM exploded GROUP BY w, event_type
        |ORDER BY w, event_type""".stripMargin,
    "q28_json" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |    AS BIGINT) AS sum_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q29_array" ->
      """SELECT label, COUNT(*) AS n, MAX(len(embedding)) AS dim
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,
    "q30_map" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |    AS BIGINT) AS sum_k,
        |  MAX(len(json_keys(props))) AS max_keys
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
  )
}
