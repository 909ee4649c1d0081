package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load

/** Graph analytics over relationship tables — triangle counting and the
  * global clustering (closure) ratio, the structural summary a mixture
  * or dedup designer reads off an entity co-occurrence graph
  * (complements the connected-component machinery in
  * [[Dedup.connectedComponents]]).
  *
  * Fixture graph: the supplier CO-SUPPLY graph — suppliers are linked
  * when they supply at least `minShared` common parts (from lineitem's
  * distinct (part, supplier) pairs). The threshold keeps the projection
  * of the bipartite part–supplier table sparse: co-occurrence
  * projections densify quadratically per hot part, thresholding is the
  * standard cure.
  *
  * Triangle counting uses DEGREE ORIENTATION (orient every undirected
  * edge from the lower-(degree, id) endpoint to the higher one): each
  * triangle then has exactly ONE node whose two triangle edges both
  * point out, so counting (wedge, closing-edge) matches counts each
  * triangle once, and the wedge fan-out per node is bounded by its
  * OUT-degree ≤ O(√m) — the classic trick that tames power-law hubs
  * (a hub of degree d contributes C(d,2) wedges un-oriented, but only
  * C(out,2) with out ≤ √(2m) oriented). The DuckDB oracle uses the
  * plain id orientation — a different edge direction assignment, the
  * SAME count — so the gate pins semantics, not plan.
  */
object Graph {

  /** Undirected co-supply edge list (u < v by id, no duplicates):
    * supplier pairs sharing ≥ `minShared` distinct parts. The per-part
    * self-join fans out C(suppliers-per-part, 2) pair rows; the count
    * agg is partial-combining, so the shuffle carries (u, v) pairs. */
  def coSupplyEdges(lineitem: DataFrame, minShared: Long): DataFrame = {
    // one p-keyed shuffle: collect each part's distinct supplier set
    // map-side (collect_set partial-combines), sort it, stream the
    // C(k,2) ordered pairs out with posexplode + per-row slice (no
    // per-row pair-array materialization — the G1 humongous-allocation
    // trap), then count pairs. A distinct-then-self-join does the same
    // work with two parquet scans and three exchanges.
    val bySupp = lineitem
      .groupBy(col("l_partkey"))
      .agg(sort_array(collect_set(col("l_suppkey"))).as("w"))
      .filter(size(col("w")) >= 2)
    // Explicit partition count: the per-part frame is tiny in bytes but
    // fans out C(k,2) pair rows each — AQE's size-based coalescing
    // would run the explode on one partition (user-specified counts
    // are exempt).
    val nPart = lineitem.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt
    bySupp
      .repartition(nPart, col("l_partkey"))
      .select(posexplode(col("w")).as(Seq("i", "u")),
        col("w"))
      .select(col("u"), explode(slice(col("w"), col("i") + 2,
        size(col("w")))).as("v"))
      .groupBy("u", "v")
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .select("u", "v")
  }

  /** Triangle census of an undirected edge list (columns u, v with
    * u < v, deduplicated): one row
    * (n_nodes, n_edges, n_wedges, n_triangles, closure_ppm) where
    * closure_ppm = 3·triangles·10⁶ div wedges (the global clustering
    * coefficient in exact integer ppm — D6, no IEEE division).
    *
    * The edge list is persisted: degrees, the wedge join, and the
    * closing-edge semi-join all scan it, and the census runs as one
    * action. */
  def triangleCensus(edges: DataFrame): DataFrame = {
    // e, deg, and oriented each feed 2–3 downstream scans (and the
    // oriented wedge self-join would otherwise recompute its whole
    // join subtree once per alias): persist all three so every frame
    // is built exactly once inside the single census action
    val e = edges.select("u", "v").persist()
    val deg = e.select(col("u").as("x"))
      .unionAll(e.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("d"))
      .persist()
    // orient each edge toward the higher (degree, id) endpoint;
    // deg is node-sized — both orientation joins broadcast it
    val oriented = e
      .join(broadcast(deg.select(col("x").as("u"), col("d").as("du"))),
        "u")
      .join(broadcast(deg.select(col("x").as("v"), col("d").as("dv"))),
        "v")
      .select(when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")),
        struct(col("u").as("a"), col("v").as("b")))
        .otherwise(struct(col("v").as("a"), col("u").as("b"))).as("o"))
      .select(col("o.a").as("a"), col("o.b").as("b"))
      .persist()
    // out-wedges (b < c by id so each unordered wedge appears once);
    // the closing edge is then looked up in stored (u < v) form
    val triangles = oriented.as("x").join(oriented.as("y"),
        col("x.a") === col("y.a") && col("x.b") < col("y.b"))
      .select(col("x.b").as("u"), col("y.b").as("v"))
      .join(e, Seq("u", "v"), "leftsemi")
      .agg(count(lit(1)).as("n_triangles"))
    val counts = deg.agg(count(lit(1)).as("n_nodes"),
      expr("sum((d * (d - 1)) div 2)").as("n_wedges"))
    val nEdges = e.agg(count(lit(1)).as("n_edges"))
    counts.crossJoin(nEdges).crossJoin(triangles)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        expr("case when n_wedges = 0 then 0L else " +
          "(n_triangles * 3 * 1000000) div n_wedges end")
          .as("closure_ppm"))
  }

  /** Q91: triangle census of the co-supply graph. minShared = 25 keeps
    * the graph sparse at sf0.1 (~3% of pairs) while lower SFs — whose
    * denser sampling co-supplies every pair far above 25 — degenerate
    * to near-complete graphs, exercising the dense path too. */
  def q91Triangles(spark: SparkSession, dir: String): DataFrame =
    triangleCensus(coSupplyEdges(load(spark, dir, "lineitem"),
      minShared = 25L))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q91_triangles" -> (q91Triangles _),
  )

  val oracle: Map[String, String] = Map(
    // Same edge set (exact integer co-supply counts), id-oriented
    // triangle join (e1.u<e1.v<e2.v chains + closing edge) — a
    // different orientation, provably the same count.
    "q91_triangles" ->
      """WITH ps AS (
        |  SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
        |e AS (
        |  SELECT a.s AS u, b.s AS v FROM ps a
        |  JOIN ps b ON a.p = b.p AND a.s < b.s
        |  GROUP BY a.s, b.s HAVING COUNT(*) >= 25),
        |deg AS (
        |  SELECT x, COUNT(*) AS d FROM (
        |    SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e)
        |  GROUP BY x),
        |tri AS (
        |  SELECT COUNT(*) AS n_triangles FROM e e1
        |  JOIN e e2 ON e2.u = e1.v
        |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |w AS (
        |  SELECT COUNT(*) AS n_nodes,
        |    CAST(SUM((d * (d - 1)) // 2) AS BIGINT) AS n_wedges
        |  FROM deg),
        |ec AS (SELECT COUNT(*) AS n_edges FROM e)
        |SELECT w.n_nodes, ec.n_edges, w.n_wedges, tri.n_triangles,
        |  CAST(CASE WHEN w.n_wedges = 0 THEN 0 ELSE
        |    (tri.n_triangles * 3 * 1000000) // w.n_wedges END AS BIGINT)
        |    AS closure_ppm
        |FROM w, ec, tri""".stripMargin,
  )
}
