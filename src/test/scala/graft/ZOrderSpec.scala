package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** Z-order layout: the Morton code must be the textbook bit interleave
  * (bijective on the domain), and the layout must actually deliver
  * multi-dimensional file skipping — measured through the same per-file
  * min/max statistics a parquet reader prunes with. */
class ZOrderSpec extends SparkSpecBase {

  test("zValue is the textbook interleave and bijective on the grid") {
    import spark.implicits._
    // z(3,5): x=011 fills even bits (1,2,0 -> 1+4), y=101 odd bits
    // (1,0,1 -> 2+32) => 39
    val pins = Seq((0L, 0L, 0L), (1L, 0L, 1L), (0L, 1L, 2L),
      (3L, 5L, 39L), (255L, 255L, 65535L))
    val got = pins.map { case (x, y, _) => (x, y) }.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.zValue(col("x"), col("y"), 8).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == pins)
    val grid = spark.range(65536)
      .select((col("id") / 256).cast("long").as("x"),
        (col("id") % 256).as("y"))
    val distinct = grid
      .select(ZOrder.zValue(col("x"), col("y"), 8).as("z"))
      .distinct().count()
    assert(distinct == 65536L) // bijective: every cell a unique z
  }

  /** Per-file bounding boxes — exactly the min/max statistics parquet
    * footers carry; a box query must read only files whose box
    * overlaps the predicate ranges. */
  private def overlapping(dir: String, x0: Long, x1: Long, y0: Long,
      y1: Long): Long =
    spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg(min("x").as("x_lo"), max("x").as("x_hi"),
        min("y").as("y_lo"), max("y").as("y_hi"))
      .filter(col("x_hi") >= x0 && col("x_lo") <= x1 &&
        col("y_hi") >= y0 && col("y_lo") <= y1)
      .count()

  test("z-ordered layout prunes on BOTH dimensions; single-sort " +
      "prunes only its own") {
    val grid = spark.range(65536)
      .select((col("id") / 256).cast("long").as("x"),
        (col("id") % 256).as("y"))
    val zDir = "/tmp/graft_zorder_spec/z"
    val linDir = "/tmp/graft_zorder_spec/linear"
    ZOrder.zOrderWrite(grid, "x", "y", 8, 16, zDir)
    grid.repartitionByRange(16, col("x"), col("y"))
      .sortWithinPartitions("x", "y")
      .write.mode("overwrite").parquet(linDir)
    def files(d: String): Long =
      spark.read.parquet(d).select(input_file_name()).distinct().count()
    assert(files(zDir) == 16 && files(linDir) == 16)
    // conservation
    assert(spark.read.parquet(zDir).count() == 65536L)

    // both-dims box = the (0,0) 64x64 tile = z-range [0, 4096), i.e.
    // 1/16 of the curve: ~1 z-file (<=3 with range-sampling slack);
    // the x-sort layout needs every file whose x-stripe intersects
    // [0,63] — 4 of 16
    // Bounds carry slack because repartitionByRange SAMPLES to pick
    // its range bounds, and the sampler's seed incorporates the RDD
    // id — suite-order-dependent, so exact file counts drift by ±1
    // with unrelated test additions (observed round 7: 3 → 4 when new
    // suites ran first). The *claims* stay strict: z never reads more
    // than the single-sort layout, and far less than all files.
    val zBoth = overlapping(zDir, 0, 63, 0, 63)
    val linBoth = overlapping(linDir, 0, 63, 0, 63)
    assert(zBoth <= 5, s"z-order box files: $zBoth")
    assert(zBoth <= linBoth,
      s"z-order must not read more than single-sort: $zBoth > $linBoth")

    // y-only box: the x-sorted layout spans ALL y in every file (its
    // y min/max is the full domain -> zero y-pruning); z-order tiles
    // bound y too, so only the y-low tiles overlap
    val zY = overlapping(zDir, 0, 255, 0, 63)
    val linY = overlapping(linDir, 0, 255, 0, 63)
    assert(linY >= 15, s"single-sort should span y everywhere: $linY")
    assert(zY <= 10, s"z-order y-only box files: $zY")
    assert(zY < linY,
      s"z-order must y-prune where single-sort can't: $zY >= $linY")
  }

  test("q182 next-fit golden: bin breaks, oversized blobs, max fill, " +
      "and shuffled-input order independence") {
    import spark.implicits._
    // cap 100. source a, sizes in doc order: 60, 30, 20, 90, 150, 10
    //   bins: [60+30], [20], wait: 60+30=90, +20 -> 110 > 100 so
    //   [60,30] | [20,90 -> 110? no: 20+90=110 > 100 so [20] | [90] |
    //   [150] oversized own bin | [10] (150+10 > 100 starts new)
    //   -> bins [90],[20],[90],[150],[10]: n_bins 5, max_fill 150
    // source b: 40, 40, 15 -> [40+40+15=95]: 1 bin, max 95
    val rows = Seq(
      ("a", 1L, 60L), ("a", 2L, 30L), ("a", 3L, 20L), ("a", 4L, 90L),
      ("a", 5L, 150L), ("a", 6L, 10L),
      ("b", 1L, 40L), ("b", 2L, 40L), ("b", 3L, 15L))
    val df = scala.util.Random.shuffle(rows)
      .toDF("source", "doc_id", "n_chars").repartition(4)
    val got = graft.operators.ZOrder.nextFitBins(df, cap = 100L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("a") == ((6L, 360L, 5L, 150L)))
    assert(got("b") == ((3L, 95L, 1L, 95L)))
  }
}
