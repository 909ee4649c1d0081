package graft

import graft.operators.{AsofJoin, Relational, Similarity}

/** Physical-plan shape assertions — the properties that make these plans
  * survive a 100× scale-up, pinned so a refactor can't silently regress
  * them (complements the per-operator result specs). */
class PlanShapeSpec extends SparkSpecBase {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q19 top-k is TakeOrderedAndProject, not a global sort") {
    val p = plan(Relational.q19TopK(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p.take(400))
  }

  test("q02 sorted limit is TakeOrderedAndProject") {
    val p = plan(Relational.q02Project(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p.take(400))
  }

  test("q34a top-k runs as partial ObjectHashAggregate before the exchange") {
    val p = plan(Similarity.q34aKnnBrute(spark, sf))
    assert(p.contains("partial_topkaggregator"), p.take(800))
    // the per-query window form this replaced would show a Window node
    assert(!p.contains("Window"), "kNN top-k regressed to a window")
  }

  test("q34c IVF cell assignment is a projection — no exchange before it") {
    val p = plan(Similarity.q34cKnnIvf(spark, sf))
    assert(p.contains("graft_nearest_centroid"), p.take(800))
    // assignment lives in the scan-side project: the text between the
    // FileScan and the first Exchange must contain the assignment expr
    val firstExchange = p.indexOf("Exchange")
    val assignAt = p.indexOf("graft_nearest_centroid")
    assert(assignAt > firstExchange,
      "expected assignment below (after in text) the top exchanges, " +
        "i.e. in the scan-side project")
  }

  test("q37 as-of join is one shuffle per side + window, no join node") {
    val p = plan(AsofJoin.q37AsofJoin(spark, sf))
    assert(p.contains("Window"), p.take(400))
    assert(!p.contains("NestedLoop"), "as-of regressed to a nested loop")
    assert(!p.contains("CartesianProduct"), "as-of regressed to cartesian")
  }

  test("q11 aggregate is partial+final hash aggregate") {
    val p = plan(Relational.q11Agg(spark, sf))
    assert(p.contains("HashAggregate"), p.take(400))
    assert(p.contains("partial_"), "no map-side partial aggregation")
  }

  test("q03 projection prunes to the read columns only") {
    val p = plan(Relational.q03Filter(spark, sf))
    val readSchema = p.split("ReadSchema: ").last.takeWhile(_ != '\n')
    assert(readSchema.contains("l_orderkey") &&
      readSchema.contains("l_quantity") &&
      !readSchema.contains("l_comment") && !readSchema.contains("l_partkey"),
      readSchema)
  }

  test("q51 power-sum stats are ONE partial+final hash aggregate pass") {
    val p = plan(graft.operators.Stats.q51Stats(spark, sf))
    assert(p.contains("HashAggregate"), p.take(400))
    assert(p.contains("partial_"), "no map-side partial power sums")
    // all six sums come from a single scan — exactly one exchange
    // between the partial and final aggregates
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 2, s"$exchanges exchanges:\n${p.take(800)}")
  }

  test("q54 gap-fill plans without cartesians or nested loops") {
    val p = plan(graft.operators.TimeSeries.q54GapFill(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      p.take(800))
  }

  test("q56 top-ngrams is partial agg + TakeOrdered, no global sort") {
    val p = plan(graft.operators.TextOps.q56TopNgrams(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p.take(600))
    assert(p.contains("partial_"), "no map-side partial counts")
  }

  test("q42 percentiles plan on the window sorter with hash joins only") {
    val p = plan(Relational.q42Percentile(spark, sf))
    assert(p.contains("Window"), p.take(600))
    assert(!p.toLowerCase.contains("percentile"),
      "buffering percentile aggregate crept back in")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      "group-result stitch regressed past a hash join")
  }

  test("q70 dup-span counting has partial aggregation and no " +
      "cartesian anywhere") {
    val p = plan(graft.operators.CorpusPrep.q70DupSpans(spark, sf))
    assert(p.contains("partial_"), "gram counts must partial-combine")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      p.take(800))
  }

  test("q62 decontamination broadcasts the bench shingle set") {
    val p = plan(graft.operators.Dedup.q62Decontaminate(spark, sf))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "bench side must broadcast, not shuffle the corpus:\n" + p.take(800))
  }

  test("q73 funnel never plans a nested loop or cartesian") {
    val p = plan(graft.operators.Behavioral.q73Funnel(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      p.take(800))
  }

  test("q82 novelty dedups inside ONE g-keyed agg — no (source, g) " +
      "exchange before it") {
    val p = plan(graft.operators.CorpusPrep
      .q82SourceNovelty(spark, sf))
    // the single full-data exchange partitions on g alone; a
    // distinct-then-window regression would add hashpartitioning(source, g)
    assert(p.contains("collect_set"), p.take(800))
    val compound = "hashpartitioning\\((source#\\d+, g#|g#\\d+, source#)"
      .r.findFirstIn(p)
    assert(compound.isEmpty,
      "novelty regressed to distinct-then-window (two full shuffles):\n" +
        p.take(1200))
  }

  test("q86 star join broadcasts dims and pushes the year filter " +
      "to the orders scan") {
    val p = plan(graft.operators.Relational
      .q86RegionalRevenue(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), " +
      "GreaterThanOrEqual(o_orderdate") ||
      p.contains("GreaterThanOrEqual(o_orderdate"),
      "o_orderdate range must reach the parquet scan:\n" + p.take(1200))
  }

  test("q80 collocations joins the vocabulary by broadcast") {
    val p = plan(graft.operators.TextOps.q80Collocations(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("q91 edge generation is one partial+final count agg — no " +
      "self-join of the bipartite table") {
    val p = plan(graft.operators.Graph
      .coSupplyEdges(graft.Tables.load(spark, sf, "lineitem"), 25L))
    assert(p.contains("HashAggregate") && p.contains("partial_"),
      p.take(800))
    assert(!p.contains("SortMergeJoin") && !p.contains("NestedLoop"),
      "edge gen regressed to a pair self-join:\n" + p.take(1200))
  }

  test("q94 item similarity: size joins broadcast, top-k is " +
      "TakeOrdered") {
    val p = plan(graft.operators.Graph.q94ItemSimilarity(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("q95 winnowing plans with no Exchange before the fingerprint " +
      "explode (pure projection until the final sort)") {
    val p = plan(graft.operators.TextOps
      .winnowFingerprints(graft.Tables.load(spark, sf, "documents")))
    assert(p.contains("Generate"), p.take(800))
    val gen = p.indexOf("Generate")
    val ex = p.indexOf("Exchange")
    assert(ex == -1 || ex < gen,
      "an exchange crept below the explode — winnowing must be a " +
        "scan-speed projection:\n" + p.take(1200))
  }

  test("q96 referential checks are broadcast anti-joins, never " +
      "nested loops") {
    val p = plan(graft.operators.Quality.q96DataQuality(spark, sf))
    assert(p.contains("BroadcastHashJoin") &&
      p.contains("LeftAnti"), p.take(800))
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      "an FK check regressed to a nested loop:\n" + p.take(1200))
  }

  test("q120 pure scan-agg: every predicate reaches PushedFilters, " +
      "read schema is the 4 predicate/agg columns only") {
    val p = plan(Relational.q120ForecastRevenue(spark, sf))
    val pushed = p.split("PushedFilters: ").last.takeWhile(_ != ']')
    assert(pushed.contains("l_shipdate") && pushed.contains("l_discount")
      && pushed.contains("l_quantity"), s"PushedFilters: $pushed")
    val readSchema = p.split("ReadSchema: ").last.takeWhile(_ != '\n')
    assert(!readSchema.contains("l_orderkey") &&
      !readSchema.contains("l_returnflag"), readSchema)
    assert(!p.contains("Join"), "a scan-agg query must not join")
  }

  test("round-6 TPC-H shapes broadcast every dimension (q119/q121/" +
      "q122/q125/q126) — no dim ever shuffles the fact side") {
    Seq(
      Relational.q119UnshippedOrders(spark, sf),
      Relational.q121ProductProfit(spark, sf),
      Relational.q122ReturnedItems(spark, sf),
      Relational.q125SupplierDiversity(spark, sf),
      Relational.q126VolumeSuppliers(spark, sf)
    ).foreach { df =>
      val p = plan(df)
      assert(p.contains("BroadcastHashJoin"), p.take(600))
      assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
        "dim join regressed:\n" + p.take(1200))
    }
  }

  test("q118 correlated-MIN decorrelation: aggregate + equality join, " +
      "no per-part subquery re-execution (no nested loop)") {
    val p = plan(Relational.q118MinCostSupplier(spark, sf))
    assert(p.contains("HashAggregate") && p.contains("partial_"),
      p.take(800))
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      "decorrelation regressed:\n" + p.take(1200))
  }

  test("q129 snapshot diff is ONE full-outer join on the key") {
    val p = plan(Relational.q129SnapshotDiff(spark, sf))
    assert(p.contains("FullOuter"), p.take(800))
    assert("SortMergeJoin|ShuffledHashJoin".r.findAllIn(p).length == 1,
      "diff must be exactly one keyed join:\n" + p.take(1200))
  }

  test("q130 equi-depth histogram never sorts a whole group: the only " +
      "row_number window partitions by (group, fraction-hit bucket)") {
    val p = plan(Relational.q130EquiDepthHist(spark, sf))
    assert(p.contains("Window"), p.take(600))
    // the full-group variant would window-partition by l_returnflag
    // alone; the split path always carries the __f partition column
    assert(p.contains("__f"), "hit-bucket ranking lost its fraction key")
  }

  test("q154 dispersion has NO pair join — the identity keeps the " +
      "plan to aggregations plus one slim label join") {
    val p = plan(Similarity
      .q154EmbedDispersion(spark, sf))
    assert(!p.contains("CartesianProduct"),
      "dispersion regressed to a pair join:\n" + p.take(800))
    assert(!p.contains("NestedLoop"),
      "dispersion regressed to a nested loop:\n" + p.take(800))
    assert(p.contains("HashAggregate") && p.contains("partial_"),
      "per-dim sums must partial-combine:\n" + p.take(800))
  }

  test("q176 centroid distances never pair-join raw vectors — the " +
      "posexplode aggregation collapses the corpus before any join") {
    val p = plan(Similarity.q176LabelCentroidDist(spark, sf))
    assert(!p.contains("CartesianProduct"),
      "centroid pair join regressed to a cartesian:\n" + p.take(800))
    // the per-(label, dim) sum must partial-combine below the join:
    // the first HashAggregate (bottom-up = last in text) sits under
    // every SortMergeJoin/BroadcastHashJoin occurrence
    val lastAgg = p.lastIndexOf("HashAggregate")
    assert(lastAgg >= 0 && p.contains("partial_sum"),
      "per-dim sums must partial-combine:\n" + p.take(800))
  }

  test("q171 two-hop joins the alphabet-sized matrix by broadcast — " +
      "no shuffle join, no cartesian") {
    val p = plan(graft.operators.Behavioral.q171TwoHop(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      "matrix self-join lost its broadcast:\n" + p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("q178 ABC classification partial-combines the per-part revenue " +
      "before the cumulative window") {
    val p = plan(Relational.q178AbcClass(spark, sf))
    assert(p.contains("partial_sum"),
      "per-part revenue must partial-combine:\n" + p.take(800))
    // the global window runs AFTER (above) the per-part aggregate:
    // Window appears before the last HashAggregate in text
    val win = p.indexOf("Window")
    val bottomAgg = p.lastIndexOf("HashAggregate")
    assert(win >= 0 && bottomAgg > win,
      "cumulative window must run on the collapsed per-part frame:\n" +
        p.take(800))
  }

  test("q144 rolling WAU's anchor join is the broadcast range join, " +
      "and the distinct collapse partial-combines before it") {
    val p = plan(graft.operators.Behavioral
      .q144RollingWau(spark, sf))
    // Match "Broadcast", not the literal BroadcastNestedLoopJoin
    // operator name: a stats/AQE drift that picks a different broadcast
    // strategy is fine — only losing the broadcast (a cartesian or a
    // shuffled nested loop) is a regression (advice r7).
    assert(p.contains("Broadcast"),
      "anchor range join lost its broadcast:\n" + p.take(800))
    assert(!p.contains("CartesianProduct"),
      "anchor join regressed to a cartesian:\n" + p.take(800))
  }

  test("q206 correlation matrix is ONE lineitem scan and join-free — " +
      "p columns must cost one pass carrying the power sums, never " +
      "p² passes (the whole point of the column-pair form vs q173's " +
      "series joins)") {
    val p = plan(graft.operators.Stats.q206FeatureCorr(spark, sf))
    val scans = p.sliding("lineitem.parquet".length)
      .count(_ == "lineitem.parquet")
    assert(scans == 1, s"lineitem scanned $scans times:\n" + p.take(1200))
    assert(!p.contains("Join"), "q206 must not join:\n" + p.take(1200))
  }

  test("q200 KPI tiles scan each fact table AT MOST ONCE — same-table " +
      "tiles fuse into one aggregate (round-8 verdict item 3: at " +
      "100 TB the events/orders scans ARE the query cost)") {
    val p = plan(Relational.q200KpiTiles(spark, sf))
    for (t <- Seq("events.parquet", "orders.parquet",
        "documents.parquet", "lineitem.parquet")) {
      val n = p.sliding(t.length).count(_ == t)
      assert(n <= 1, s"$t scanned $n times:\n" + p.take(1500))
    }
  }

  test("global rank windows (q189/q210/q168/q226) ride the size-" +
      "switched scan: fixture frames keep the one-window plan, a " +
      "planted colossal frame takes the range-split path (round-10 " +
      "verdict item 6 — no task sorts a 10⁹-entity frame)") {
    import spark.implicits._
    // fixture-sized: the four queries' plans all contain a plain
    // unpartitioned rank window (fastest plan at entity scale)
    for (df <- Seq(
        Relational.q189NtileDeciles(spark, sf),
        graft.operators.Behavioral.q210PowerUserShare(spark, sf),
        graft.operators.Stats.q168TopShare(spark, sf),
        graft.operators.TextOps.q226HeadCoverage(spark, sf))) {
      val p = df.queryExecution.optimizedPlan.toString
      assert(!p.contains("windowspecdefinition(__pid"),
        "fixture-sized frame must not pay the split path:\n" + p.take(600))
    }
    // planted colossal (threshold forced down): rank is per-range-
    // partition, bit-equal results pinned in PercentileRankSpec
    val big = (1 to 200).map(i => (i.toLong, (i % 17).toLong))
      .toDF("id", "v")
    val split = graft.operators.Percentiles.globalOrderedScan(big,
      Seq(org.apache.spark.sql.functions.col("v").desc,
        org.apache.spark.sql.functions.col("id")),
      "rn", splitThreshold = 50L)
    assert(split.queryExecution.optimizedPlan.toString
      .contains("row_number() windowspecdefinition(__pid"),
      "colossal frame must take the range-split rank path")
  }

  test("q240 CDC apply is ONE join (the full-outer on the key) plus " +
      "the changelog derivation — no cartesian, no extra snapshot " +
      "scan joins") {
    val p = plan(Relational.q240ApplyCdc(spark, sf))
    assert(!p.contains("Cartesian") && !p.contains("NestedLoop"),
      "CDC apply must never plan a cartesian:\n" + p.take(1200))
    assert(p.contains("FullOuter"),
      "upsert shape is the key-partitioned full-outer join:\n" +
        p.take(1200))
  }

  test("q236 LSH calibration plans without cartesians — signatures " +
      "join the pair set by doc id, never all-pairs") {
    val p = plan(graft.operators.Dedup
      .q236LshCalibration(spark, sf))
    assert(!p.contains("Cartesian") && !p.contains("NestedLoop"),
      p.take(1200))
  }

  test("q233/q234/q235 audit views never re-run the postings " +
      "pipeline — they plan over the memoized (checkpointed) pair " +
      "set, so no shingle explode appears") {
    for (df <- Seq(
        graft.operators.Dedup.q233ContaminationMatrix(spark, sf),
        graft.operators.Dedup.q234SplitLeakage(spark, sf),
        graft.operators.Dedup.q235DedupImpact(spark, sf))) {
      val p = plan(df)
      assert(p.contains("Scan ExistingRDD") || p.contains("LogicalRDD")
          || p.contains("Scan rdd"),
        "audit must read the checkpointed pair set:\n" + p.take(800))
      assert(!p.contains("Generate"),
        "audit must not recompute shingle postings (no explode):\n" +
          p.take(800))
    }
  }

  test("q245 substring dedup pairs via the gram-keyed equi-join — " +
      "never a cartesian/nested-loop (the hash group-by IS the " +
      "suffix-sort replacement)") {
    val p = plan(graft.operators.CorpusPrep
      .q245SubstringDedup(spark, sf))
    assert(!p.contains("Cartesian") && !p.contains("NestedLoop"),
      p.take(1200))
  }

  test("q247 BM25: postings-bounded fan-out (query-term set joins " +
      "broadcast) and distributed top-k (TakeOrdered, no global " +
      "sort of the scored set)") {
    val p = plan(graft.operators.TextOps.q247Bm25(spark, sf))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "query-term set must broadcast into the tf table:\n" + p.take(1200))
    assert(p.contains("TakeOrderedAndProject"),
      "top-k must be TakeOrdered, not a global sort:\n" + p.take(1200))
    // (the 1-row scalar frame rides a BroadcastNestedLoopJoin — the
    // established 1-row crossJoin shape; a CartesianProduct would be
    // the actual failure)
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("q261 postings delta: ONE full-outer SortMergeJoin on the " +
      "compound (doc_id, term) key — no cartesian, no nested loop " +
      "(the q129/q240 snapshot-diff shape)") {
    val p = plan(graft.operators.TextOps.q261PostingsDelta(spark, sf))
    assert(p.contains("FullOuter"), p.take(1200))
    assert(!p.contains("Cartesian") && !p.contains("NestedLoop"),
      p.take(1200))
  }

  test("q266 transitivity census plans cartesian-free (pair graph " +
      "joins are equi-joins on endpoints)") {
    val p = plan(graft.operators.Dedup
      .q266DedupTransitivity(spark, sf))
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("q255 multi-query BM25: the query TABLE still broadcasts into " +
      "tf, per-query top-k is a rank window PARTITIONED by query_id " +
      "(sorts postings-bounded candidates, never the corpus), no " +
      "cartesian") {
    val p = plan(graft.operators.TextOps.q255Bm25Multi(spark, sf))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "query table must broadcast into the tf table:\n" + p.take(1200))
    assert(p.contains("Window") &&
      p.contains("windowspecdefinition(query_id"),
      "per-query rank window must partition by query_id:\n" + p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("q271 multi-query hybrid: the BUILD plan keeps dense " +
      "candidates cell-bounded (equi-joins only, no cartesian — never " +
      "a corpus×queries product) and every rank window partitions by " +
      "query_id (round 13)") {
    val p = plan(graft.operators.Similarity
      .hybridMultiRankingsBuild(spark, sf, 50))
    assert(!p.contains("CartesianProduct"),
      "dense candidate generation must stay an equi-join on cell:\n" +
        p.take(1500))
    assert(p.contains("windowspecdefinition(query_id"),
      "per-query windows must partition by query_id:\n" + p.take(1500))
    // and the final readout over the memoized fused frame sorts only
    // per query (window), never a corpus-sized global set
    val r = plan(graft.operators.Similarity.q271HybridMulti(spark, sf))
    assert(!r.contains("CartesianProduct"), r.take(800))
    assert(r.contains("windowspecdefinition(query_id"), r.take(800))
  }

  test("q285 IVF-ADC serving pipeline: candidates stay cell-bounded " +
      "equi-joins (no cartesian), the ADC/exact lookup sides broadcast, " +
      "and every ranking window partitions per query (round 13)") {
    val p = plan(graft.operators.Similarity.q285IvfAdcTopK(spark, sf))
    assert(!p.contains("CartesianProduct"),
      "IVF candidate generation must stay an equi-join on cell:\n" +
        p.take(1500))
    assert(p.contains("BroadcastHashJoin"),
      "the codebook/lookup sides must broadcast:\n" + p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
    assert(p.contains("windowspecdefinition(qid"),
      "per-query windows must partition by qid:\n" + p.take(1500))
  }

  test("q302 reads ONLY the memoized cascade state (zero parquet " +
      "scans — the registers are a window over checkpointed " +
      "compactors) and q302b adds exactly ONE lineitem scan (the " +
      "exact-rank audit histogram)") {
    val p302 = plan(Relational.q302QuantileSketchRegisters(spark, sf))
    assert(p302.sliding("lineitem.parquet".length)
      .count(_ == "lineitem.parquet") == 0,
      "registers must read the memoized state:\n" + p302.take(1200))
    val p302b = plan(Relational.q302bQuantileSketchQuery(spark, sf))
    assert(p302b.sliding("lineitem.parquet".length)
      .count(_ == "lineitem.parquet") <= 1,
      "the audit needs one histogram scan, not re-derivation:\n" +
        p302b.take(1200))
    assert(!p302b.contains("CartesianProduct"), p302b.take(800))
  }

  test("q309 shortlist sweep: no cartesian products (the 4-row cut " +
      "frame broadcasts) and every ranking window partitions per " +
      "(shortlist, qid) — never a global sort") {
    val p = plan(graft.operators.Similarity
      .q309RefineShortlistSweep(spark, sf))
    assert(!p.contains("CartesianProduct"), p.take(1200))
    assert(p.contains("windowspecdefinition(shortlist"),
      "per-cut windows must partition by (shortlist, qid):\n" +
        p.take(1200))
  }

  test("q300 cluster labels checkpoint the shared (cell, term) tf " +
      "aggregate — the corpus tokenize+explode runs ONCE, not once " +
      "per consumer (ccf / n_cells / final join; round-14 verdict " +
      "item 4, the q245 multi-consumer rule)") {
    val p = plan(graft.operators.Similarity.q300ClusterLabels(spark, sf))
    val scans = p.sliding("documents.parquet".length)
      .count(_ == "documents.parquet")
    assert(scans == 0,
      s"documents.parquet appears $scans times in the FINAL plan — " +
        "ctf must be checkpointed so every consumer reads the " +
        "materialized aggregate, not the corpus:\n" + p.take(1500))
  }

  test("q314 soft-dedup weights plan over the memoized component " +
      "labels — no shingle explode (Generate) and no cartesian: the " +
      "whole query is label-sized joins + one broadcast normalizer " +
      "(round-16; the q233-family memo-reuse pin)") {
    val p = plan(graft.operators.Dedup.q314SoftDedupWeights(spark, sf))
    assert(p.contains("Scan ExistingRDD") || p.contains("LogicalRDD")
        || p.contains("Scan rdd"),
      "must read the checkpointed component table:\n" + p.take(800))
    assert(!p.contains("Generate"),
      "must not recompute shingle postings:\n" + p.take(800))
    // the 1-row normalizer crossJoin(broadcast) plans as a
    // BroadcastNestedLoopJoin — the house 1-row-broadcast shape;
    // only an unbroadcast CartesianProduct would be a defect
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("q310 refine-budget sweep: cartesian-free (every decode join " +
      "is keyed or broadcast; the sweep fans only the shortlist)") {
    val p = plan(graft.operators.Similarity
      .q310RefineBudgetSweep(spark, sf))
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }
}
