package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load

/** Z-order (Morton-curve) data layout — multi-dimensional file skipping.
  *
  * A 100 TB table is pruned by parquet min/max column statistics: a scan
  * skips any file whose [min, max] range misses the predicate. Sorting
  * the layout by ONE column gives tight per-file ranges on that column
  * and useless full-span ranges on every other. Interleaving the bits of
  * two columns (the public Morton 1966 space-filling curve; the same
  * layout idea behind the well-known OPTIMIZE ZORDER command of lakehouse
  * table formats) makes each compact z-range an axis-aligned tile of the
  * (x, y) value space — so per-file min/max becomes a tight bounding BOX
  * and a predicate on EITHER (or both) dimensions skips files.
  *
  * Everything here is declarative: the z-value is a pure codegen'd
  * integer expression (shifts/and/or — no UDF, ANSI-safe, no overflow
  * for bits ≤ 31), and the layout is one `repartitionByRange` + local
  * sort, i.e. one range shuffle at ingest that every later query
  * amortizes. ZOrderSpec measures the effect: on a uniform 256×256
  * grid in 16 files, a both-dims box query touches ≤3 z-ordered files
  * (vs 4 single-sort), and a y-only box touches ≤8 (vs ALL 16 under a
  * single-column sort, whose per-file y-range is the full domain).
  */
object ZOrder {

  /** Morton code of the low `bits` bits of two non-negative integral
    * columns: x occupies even bit positions, y odd. A fold of
    * shift/and/or column ops — whole-stage-codegen'd, engine-portable
    * (the oracle replays the identical bit algebra in SQL). */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits out of [1,31]")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(
          shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** The same bit algebra as SQL, for oracles and SQL-only users. */
  def zValueSql(x: String, y: String, bits: Int): String =
    ((0 until bits).map(i => s"((($x >> $i) & 1) << ${2 * i})") ++
      (0 until bits).map(i => s"((($y >> $i) & 1) << ${2 * i + 1})"))
      .mkString(" | ")

  /** Write `df` z-ordered on (xCol, yCol): range-partition on the
    * z-value so each of the `numFiles` output files owns a compact
    * z-range — an axis-aligned tile (or small run of tiles) of value
    * space — then sort within partitions so row groups inherit the
    * same locality. One range shuffle, paid once at ingest. */
  def zOrderWrite(df: DataFrame, xCol: String, yCol: String, bits: Int,
      numFiles: Int, path: String): Unit =
    df.withColumn("__z", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Q117: the z-value as an oracle-gated query — the engine-portable
    * bit interleave computed per part over (p_partkey mod 256, p_size),
    * first 200 rows of the curve. Pins the exact layout key both
    * engines would use, so a z-ordered ingest is reproducible across
    * engines (D-rules: pure integer bit algebra, total order on
    * (zval, p_partkey)). */
  def q117ZValue(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "part")
      .select(col("p_partkey"), (col("p_partkey") % 256).as("x"),
        col("p_size").cast("long").as("y"))
      .select(col("p_partkey"), col("x"), col("y"),
        zValue(col("x"), col("y"), 8).as("zval"))
      .orderBy("zval", "p_partkey").limit(200)

  // ---------------------------------------------------------------- q182

  /** Q182: COMPACTION PLANNING by next-fit bin packing — per source,
    * documents in doc_id order pack into ≤64 KiB bins (a blob larger
    * than the cap gets its own bin and the next item starts fresh);
    * emits per source the doc count, byte total, bin count, and
    * fullest bin. The small-file compaction planner every lakehouse
    * maintenance job runs; next-fit (not first-fit-decreasing) is the
    * STREAMING packing — single-bin state, order-respecting, exactly
    * what an ingest-time writer can do, and a 2-approximation of
    * optimal.
    *
    * Like q174, the recurrence is non-linear (conditional reset — no
    * window expresses it): the q132/q146 spill-sort fold, state = four
    * longs; the oracle replays it as a RECURSIVE CTE per source. */
  /** The fold core over (source, doc_id, n_chars) — exposed so
    * ZOrderSpec can golden-test the packing on planted sequences. */
  def nextFitBins(sized: DataFrame, cap: Long): DataFrame = {
    val spark = sized.sparkSession
    import spark.implicits._
    sized
      .select(col("source"), col("doc_id"), col("n_chars"))
      .as[(String, Long, Long)]
      .repartition(col("source"))
      .sortWithinPartitions("source", "doc_id")
      .mapPartitions { it =>
        val buf = it.buffered
        new Iterator[(String, Long, Long, Long, Long)] {
          def hasNext: Boolean = buf.hasNext
          def next(): (String, Long, Long, Long, Long) = {
            val src = buf.head._1
            var n = 0L; var total = 0L; var bins = 0L
            var fill = 0L; var maxFill = 0L
            while (buf.hasNext && buf.head._1 == src) {
              val s = buf.next()._3
              if (bins == 0L || fill + s > cap) { bins += 1L; fill = s }
              else fill += s
              if (fill > maxFill) maxFill = fill
              n += 1L; total += s
            }
            (src, n, total, bins, maxFill)
          }
        }
      }
      .toDF("source", "n_docs", "total_chars", "n_bins", "max_fill")
  }

  def q182CompactionNextfit(spark: SparkSession, dir: String): DataFrame =
    nextFitBins(load(spark, dir, "documents"), cap = 65536L)
      .orderBy("source")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q117_zvalue" -> (q117ZValue _),
    "q182_compaction_nextfit" -> (q182CompactionNextfit _))

  val oracle: Map[String, String] = Map(
    // q182: the fold replayed breadth-wise rn → rn+1 per source; the
    // conditional reset and GREATEST running max are the fold's exact
    // branches. max_fill initializes to the first item's size (one
    // bin, fill = size) — matching the Scala init.
    "q182_compaction_nextfit" ->
      """WITH RECURSIVE d AS (
        |  SELECT source, doc_id, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id)
        |      AS rn
        |  FROM documents),
        |s AS (
        |  SELECT source, rn, n_chars AS fill,
        |    CAST(1 AS BIGINT) AS bins, n_chars AS max_fill,
        |    n_chars AS total
        |  FROM d WHERE rn = 1
        |  UNION ALL
        |  SELECT d.source, d.rn,
        |    CASE WHEN s.fill + d.n_chars > 65536 THEN d.n_chars
        |         ELSE s.fill + d.n_chars END,
        |    s.bins + CASE WHEN s.fill + d.n_chars > 65536
        |                  THEN 1 ELSE 0 END,
        |    GREATEST(s.max_fill,
        |      CASE WHEN s.fill + d.n_chars > 65536 THEN d.n_chars
        |           ELSE s.fill + d.n_chars END),
        |    s.total + d.n_chars
        |  FROM s JOIN d ON d.source = s.source AND d.rn = s.rn + 1),
        |fin AS (SELECT source, MAX(rn) AS n_docs FROM s GROUP BY 1)
        |SELECT s.source, CAST(f.n_docs AS BIGINT) AS n_docs,
        |  s.total AS total_chars, s.bins AS n_bins, s.max_fill
        |FROM s JOIN fin f
        |  ON f.source = s.source AND s.rn = f.n_docs
        |ORDER BY s.source""".stripMargin,
    "q117_zvalue" ->
      s"""WITH b AS (
         |  SELECT p_partkey, p_partkey % 256 AS x,
         |    CAST(p_size AS BIGINT) AS y
         |  FROM part)
         |SELECT p_partkey, x, y,
         |  ${zValueSql("x", "y", 8)} AS zval
         |FROM b ORDER BY zval, p_partkey LIMIT 200""".stripMargin)
}
