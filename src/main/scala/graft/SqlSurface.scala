package graft

import org.apache.spark.sql.SparkSession

import graft.operators.{AsofJoin, Behavioral, Clustering, CorpusPrep, Dedup, Graph, Quality, Similarity, TextOps}

/** SQL front door for the operator library — everything a SQL-only user
  * needs to reach the LLM-pipeline operators from `spark.sql` alone.
  *
  * Two layers:
  *  1. the native expression surface (`graft_minhash`, `graft_simhash`,
  *     `graft_hyperplane`, `graft_cosine`, `graft_dot`,
  *     `graft_nearest_centroid`, …) — injected session-wide by
  *     `spark.sql.extensions=graft.functions.GraftExtensions`, or
  *     post-hoc on a live session via [[registerFunctions]]. With these
  *     a SQL user composes the same banded/bucketed plans the Scala
  *     operators build (SQLSurfaceSpec runs one end-to-end);
  *  2. whole-operator entry points whose driving logic isn't a single
  *     expression (as-of join, dedup pair generation, kNN): exposed as
  *     temp-VIEW BUILDERS — the operator's DataFrame is registered
  *     under a name, and from there on it is plain SQL. Views are lazy
  *     plans, not materializations: the full operator pipeline plans,
  *     optimizes, and distributes exactly as the Scala call would.
  */
object SqlSurface {

  /** Register every graft native expression on a live session (the
    * post-hoc twin of the GraftExtensions injection). */
  def registerFunctions(spark: SparkSession): Unit = {
    functions.CosineSimilarityExpr.register(spark)
    functions.DotProductExpr.register(spark)
    functions.NearestCentroidExpr.register(spark)
    functions.SignatureExprs.register(spark)
  }

  /** Register the data directory's tables as temp views (`documents`,
    * `embeddings`, the TPC-H-ish tables, and `events` via the
    * nanos-safe reader). */
  def registerTables(spark: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      Tables.load(spark, dir, t).createOrReplaceTempView(t)
    }
    Tables.events(spark, dir).createOrReplaceTempView("events")
  }

  /** Exact n-gram Jaccard near-dup pairs of `docsView` (doc_id, text) →
    * view (doc_a, doc_b, jaccard). */
  def createNearDupPairsView(spark: SparkSession, docsView: String,
      viewName: String, k: Int = 3, threshold: Double = 0.5): Unit =
    Dedup.ngramJaccardPairs(spark.table(docsView), k = k,
      threshold = threshold).createOrReplaceTempView(viewName)

  /** Survivors of exact near-dup removal over `docsView` → view with the
    * source schema. */
  def createDedupSurvivorsView(spark: SparkSession, docsView: String,
      viewName: String, k: Int = 3, threshold: Double = 0.5): Unit =
    Dedup.dropNearDuplicatesExact(spark.table(docsView), k = k,
      threshold = threshold).createOrReplaceTempView(viewName)

  /** Backward as-of join of two views → view (left columns + carried
    * right value columns). */
  def createAsofJoinView(spark: SparkSession, leftView: String,
      rightView: String, key: String, ts: String, valueCols: Seq[String],
      viewName: String): Unit =
    AsofJoin.asofJoin(spark.table(leftView), spark.table(rightView),
      key, ts, valueCols).createOrReplaceTempView(viewName)

  /** Exact brute-force kNN of `queriesView` against `vectorsView`
    * (vec_id, embedding) → view (qid, rank, neighbor, cos). */
  def createKnnView(spark: SparkSession, vectorsView: String,
      queriesView: String, k: Int, viewName: String): Unit =
    Similarity.knnBrute(spark.table(vectorsView),
      spark.table(queriesView), k).createOrReplaceTempView(viewName)

  /** Overlapping character chunks of `docsView` (doc_id, text, n_chars)
    * → view (doc_id, chunk_idx, chunk, chunk_len). */
  def createChunksView(spark: SparkSession, docsView: String,
      viewName: String, window: Int = 200, stride: Int = 150): Unit =
    CorpusPrep.chunkDocuments(spark.table(docsView), window, stride)
      .createOrReplaceTempView(viewName)

  /** Per-user strict-funnel first-completion times of `eventsView`
    * (user_id, event_type, ts_ns) → view (user_id, t0 … tk). */
  def createFunnelView(spark: SparkSession, eventsView: String,
      stages: Seq[String], viewName: String): Unit =
    Behavioral.funnelTimes(spark.table(eventsView), stages)
      .createOrReplaceTempView(viewName)

  /** Cohort retention cells of `eventsView` → view
    * (cohort_wk, week_offset, n_users). */
  def createCohortView(spark: SparkSession, eventsView: String,
      viewName: String): Unit =
    Behavioral.cohortRetention(spark.table(eventsView))
      .createOrReplaceTempView(viewName)

  /** Per-source dataset card of `docsView` (doc_id, text, lang, source,
    * n_chars) → view (source, n_docs, tok_sum, avg_chars, en_bp,
    * dup_bp). */
  def createCorpusReportView(spark: SparkSession, docsView: String,
      viewName: String): Unit =
    CorpusPrep.corpusReport(spark.table(docsView))
      .createOrReplaceTempView(viewName)

  /** Collocations of `docsView` by integer lift → view
    * (bigram, n_ab, n_a, n_b, lift_ppm). */
  def createCollocationsView(spark: SparkSession, docsView: String,
      minCount: Long, k: Int, viewName: String): Unit =
    TextOps.collocations(spark.table(docsView), minCount, k)
      .createOrReplaceTempView(viewName)

  /** Triangle census of an edge-list view (u, v; u < v, deduped) →
    * 1-row view (n_nodes, n_edges, n_wedges, n_triangles,
    * closure_ppm). */
  def createTriangleCensusView(spark: SparkSession, edgesView: String,
      viewName: String): Unit =
    Graph.triangleCensus(spark.table(edgesView))
      .createOrReplaceTempView(viewName)

  /** Integer-scaled PageRank of an edge-list view → view
    * (node, score). */
  def createPageRankView(spark: SparkSession, edgesView: String,
      iters: Int, viewName: String): Unit =
    Graph.pageRank(spark.table(edgesView), iters)
      .createOrReplaceTempView(viewName)

  /** Winnowing fingerprints of `docsView` (doc_id, text) → view
    * (doc_id, pos, fp). */
  def createWinnowView(spark: SparkSession, docsView: String,
      viewName: String): Unit =
    TextOps.winnowFingerprints(spark.table(docsView))
      .createOrReplaceTempView(viewName)

  /** Data-quality constraint report over the registered TPC-H-ish
    * views → view (check_name, n_bad). */
  def createQualityReportView(spark: SparkSession, viewName: String)
      : Unit =
    Quality.dataQualityReport(spark.table("orders"),
      spark.table("lineitem"), spark.table("customer"),
      spark.table("nation")).createOrReplaceTempView(viewName)

  /** Misra–Gries heavy hitters of a token view (`tokenCol` string
    * column) → view (w, c): every token with frequency >
    * n·`thresholdNum`/`thresholdDen`, exact counts, O(k) state per
    * partition — the 100 TB path that never shuffles the full
    * vocabulary. */
  def createHeavyHittersView(spark: SparkSession, tokensView: String,
      tokenCol: String, k: Int, viewName: String,
      thresholdNum: Long = 1, thresholdDen: Long = 400): Unit =
    TextOps.heavyHittersMG(spark.table(tokensView), tokenCol, k,
      thresholdNum, thresholdDen).createOrReplaceTempView(viewName)

  /** Snapshot diff (CDC) of two keyed views → view (key, op ∈ I/U/D,
    * plus old_c and new_c for each compared column c). */
  def createSnapshotDiffView(spark: SparkSession, oldView: String,
      newView: String, key: String, compareCols: Seq[String],
      viewName: String): Unit =
    operators.Relational.snapshotDiff(spark.table(oldView),
      spark.table(newView), key, compareCols)
      .createOrReplaceTempView(viewName)

  /** Event-time interval join (conversion attribution) of two event
    * views → view (user_id, a_id, b_id, b_value, gap_us). On batch
    * views this is the theta join; the SAME builder body on streaming
    * views yields the state-bounded stream-stream join. */
  def createIntervalJoinView(spark: SparkSession, triggersView: String,
      followUpsView: String, triggerType: String, followType: String,
      horizonSeconds: Long, viewName: String): Unit =
    streaming.StreamOps.intervalJoinStream(spark.table(triggersView),
      spark.table(followUpsView), triggerType, followType,
      horizonSeconds).createOrReplaceTempView(viewName)

  /** Per-event session labels of an events view (user_id, ts_ns,
    * event_id, event_type) → view with (…, session_no) under the
    * 30-minute (default) inactivity-gap definition — q141's exact
    * derivation (round 8). */
  def createSessionsView(spark: SparkSession, eventsView: String,
      viewName: String, gapUs: Long = 1800L * 1000000L): Unit =
    Behavioral.sessionized(spark.table(eventsView), gapUs)
      .createOrReplaceTempView(viewName)

  /** Rolling distinct-user window (7-day WAU by default) of an events
    * view (user_id, ts) → view (d, wau7) — q144's distinct-collapse +
    * broadcast anchor-range plan. */
  def createRollingWauView(spark: SparkSession, eventsView: String,
      viewName: String, windowDays: Int = 7): Unit =
    Behavioral.rollingWau(spark.table(eventsView), windowDays)
      .createOrReplaceTempView(viewName)

  /** Fixed-round label-propagation communities of an edge-list view
    * (u, v) → view (node, community) — q143's deterministic argmax
    * propagation. */
  def createCommunitiesView(spark: SparkSession, edgesView: String,
      viewName: String, rounds: Int = 3): Unit =
    Graph.labelPropagation(spark.table(edgesView), rounds)
      .createOrReplaceTempView(viewName)

  /** Per-community modularity decomposition of an edge-list view
    * against a (node, community) labels view → view (community,
    * n_nodes, e_in, k_sum, q_num, q_e6) — q155's exact integer
    * Newman–Girvan audit. */
  def createModularityView(spark: SparkSession, edgesView: String,
      labelsView: String, viewName: String): Unit =
    Graph.modularityByCommunity(spark.table(edgesView),
      spark.table(labelsView)).createOrReplaceTempView(viewName)

  /** Holt level+trend smoothing of a per-key daily series view
    * (event_type, dnum, v) → view (event_type, n_days, level_e3,
    * trend_e3, forecast_e3) — q146's two-long-state spill-sorted
    * fold. */
  def createHoltView(spark: SparkSession, dailyView: String,
      viewName: String): Unit =
    operators.Stats.holtByType(spark.table(dailyView))
      .createOrReplaceTempView(viewName)

  /** Daily OHLC bars of an events view (event_type, ts, ts_ns,
    * event_id, value) → view (event_type, day, n_events, open, high,
    * low, close) — q136's two-direction row_number selection. */
  def createOhlcView(spark: SparkSession, eventsView: String,
      viewName: String): Unit =
    operators.TimeSeries.ohlcBars(spark.table(eventsView))
      .createOrReplaceTempView(viewName)

  /** Last-touch attribution rollup of an events view (user_id, ts_ns,
    * event_id, event_type, value) → view (channel, n_conv,
    * revenue_cents) — q169's single window-pass credit assignment
    * (round 8). */
  def createAttributionView(spark: SparkSession, eventsView: String,
      viewName: String): Unit =
    Behavioral.lastTouchReport(spark.table(eventsView))
      .createOrReplaceTempView(viewName)

  /** Time-windowed funnel census of an events view → view (stage,
    * n_users): users counted at the deepest stage whose strict
    * first-completion chain finishes within `horizonNs` of the funnel
    * start — q186 (round 8). */
  def createWindowedFunnelView(spark: SparkSession, eventsView: String,
      stages: Seq[String], horizonNs: Long, viewName: String): Unit =
    Behavioral.funnelWindowed(spark.table(eventsView), stages,
      horizonNs).createOrReplaceTempView(viewName)

  /** Day-N retention of an events view (user_id, ts) → view (n_day,
    * n_cohort, n_retained, retention_bp) — q187's exact
    * active-exactly-N-days-later curve (round 8). */
  def createDnRetentionView(spark: SparkSession, eventsView: String,
      viewName: String, days: Seq[Int] = Seq(1, 7, 14)): Unit =
    Behavioral.dnRetention(spark.table(eventsView), days)
      .createOrReplaceTempView(viewName)

  /** Growth accounting of an events view (user_id, ts) → view (d,
    * n_active, n_new, n_returning, cum_users) — q199's new/returning
    * decomposition with exact cumulative distinct users (round 8). */
  def createGrowthAccountingView(spark: SparkSession,
      eventsView: String, viewName: String): Unit =
    Behavioral.growthAccounting(spark.table(eventsView))
      .createOrReplaceTempView(viewName)

  /** Discrete-hazard life table of an orders view (o_custkey,
    * o_orderdate) → view (q, n_risk, n_churn, hazard_ppm) — q198's
    * censoring-aware Kaplan–Meier input (round 8). */
  def createLifeTableView(spark: SparkSession, ordersView: String,
      viewName: String): Unit =
    operators.Stats.lifeTable(spark.table(ordersView))
      .createOrReplaceTempView(viewName)

  /** Balance-decile report of a customer view (c_custkey, c_acctbal)
    * → view (decile, n_cust, hi, lo) — q189's NTILE cut under the
    * deterministic (balance desc, key) total order (round 8). */
  def createDecilesView(spark: SparkSession, customersView: String,
      viewName: String): Unit =
    operators.Relational.ntileDeciles(spark.table(customersView))
      .createOrReplaceTempView(viewName)

  /** Keyword-in-context concordance of a docs view (doc_id, text) →
    * view (doc_id, pos, left_ctx, right_ctx) — q201 (round 9). */
  def createKwicView(spark: SparkSession, docsView: String,
      term: String, viewName: String, ctx: Int = 2): Unit =
    TextOps.kwic(spark.table(docsView), term, ctx)
      .createOrReplaceTempView(viewName)

  /** Semantic dedup (SemDeDup shape) over an embeddings view
    * (vec_id, embedding) → view (vec_id) of survivors — q230
    * (round 10): seed-Voronoi cells, within-cell exact-cosine pairs,
    * greedy keep-lowest-id. */
  def createSemanticDedupView(spark: SparkSession, embView: String,
      viewName: String, k: Int = 8, thresholdE6: Long = 900000L): Unit =
    Similarity.semanticDedup(spark.table(embView), k, thresholdE6)
      .createOrReplaceTempView(viewName)

  /** N-round BPE tokenizer training over a docs view (text) → view
    * (merge_round, merge_l, merge_r, weight) — q229 (round 10). */
  def createBpeMergesView(spark: SparkSession, docsView: String,
      viewName: String, rounds: Int = 6): Unit =
    TextOps.bpeTrain(spark.table(docsView), rounds)
      .createOrReplaceTempView(viewName)

  /** SCD2 interval history of an events view (user_id, ts_ns,
    * event_id, event_type) → view (user_id, version_no, state,
    * valid_from_us, valid_to_us, n_events) — q202's change-only run
    * collapse (round 9). */
  def createScd2View(spark: SparkSession, eventsView: String,
      viewName: String): Unit =
    Behavioral.scd2Intervals(spark.table(eventsView))
      .createOrReplaceTempView(viewName)

  /** Per-node local clustering of an edge-list view (u, v with
    * u < v, deduplicated) → view (node, degree, n_tri, cc_ppm) —
    * q204 (round 9). */
  def createLocalClusteringView(spark: SparkSession, edgesView: String,
      viewName: String): Unit =
    operators.Graph.localClustering(spark.table(edgesView))
      .createOrReplaceTempView(viewName)

  /** Partition-key skew audit over (label, view, keyCol) triples →
    * view (key_col, n_rows, n_keys, max_cnt, top_share_ppm,
    * skew_x1000) — q207 (round 9). */
  def createSkewAuditView(spark: SparkSession,
      cols: Seq[(String, String, String)], viewName: String): Unit =
    Quality.skewAudit(cols.map { case (n, v, k) =>
      (n, spark.table(v), k) }).createOrReplaceTempView(viewName)

  /** Markov steady-state distribution of an events view → view
    * (state, pi_ppm) — q213's 5 integer power iterations (round 9). */
  def createMarkovSteadyView(spark: SparkSession, eventsView: String,
      viewName: String, iters: Int = 5): Unit =
    Behavioral.markovSteady(spark.table(eventsView), iters)
      .createOrReplaceTempView(viewName)

  /** Functional-dependency audit over (name, view, lhs, rhs) tuples →
    * view (fd, n_lhs, n_violating, holds) — q215 (round 9). */
  def createFdAuditView(spark: SparkSession,
      fds: Seq[(String, String, String, String)],
      viewName: String): Unit =
    Quality.fdAudit(fds.map { case (n, v, l, r) =>
      (n, spark.table(v), l, r) }).createOrReplaceTempView(viewName)

  /** Join-cardinality audit over (label, leftView, leftKey,
    * rightView, rightKey) tuples → view (join_key, left_rows,
    * right_rows, n_matched_keys, join_rows, amp_x1000) — q221's
    * exact-size-without-running-it planner readout (round 9). */
  def createJoinCardinalityView(spark: SparkSession,
      joins: Seq[(String, String, String, String, String)],
      viewName: String): Unit =
    Quality.joinCardinality(joins.map { case (n, lv, lk, rv, rk) =>
      (n, spark.table(lv), lk, spark.table(rv), rk)
    }).createOrReplaceTempView(viewName)

  /** Peak ingest rate of an events view (event_type, ts_ns) → view
    * (event_type, n_active_minutes, n_events, peak_per_min,
    * peak_minute, mean_per_min_e3, burst_x1000) — q222 (round 9). */
  def createPeakRateView(spark: SparkSession, eventsView: String,
      viewName: String): Unit =
    operators.TimeSeries.peakRate(spark.table(eventsView))
      .createOrReplaceTempView(viewName)

  /** Length-distribution drift between the two ingest halves of a
    * documents view (doc_id, n_chars) → view (bucket, n1, n2, s1_ppm,
    * s2_ppm, d_ppm) with a bucket = -1 TOTAL row carrying the exact
    * TVD — q223 (round 9). */
  def createDistDriftView(spark: SparkSession, docsView: String,
      viewName: String): Unit =
    TextOps.distDrift(spark.table(docsView))
      .createOrReplaceTempView(viewName)

  /** Dedup threshold sweep over a verified-pairs view (doc_a, doc_b,
    * jaccard) → view (threshold_ppm, n_pairs, n_docs) — q237
    * (round 10). */
  def createThresholdSweepView(spark: SparkSession, pairsView: String,
      viewName: String): Unit =
    Dedup.thresholdSweep(spark.table(pairsView))
      .createOrReplaceTempView(viewName)

  /** MinHash calibration curve: docs view (doc_id, text) + verified
    * pairs view (doc_a, doc_b, jaccard) → view (bucket, n_pairs,
    * agree_ppm) — q236 (round 10). */
  def createLshCalibrationView(spark: SparkSession, docsView: String,
      pairsView: String, viewName: String): Unit =
    Dedup.lshCalibration(spark.table(docsView), spark.table(pairsView))
      .createOrReplaceTempView(viewName)

  /** Quality-representative selection: docs view (doc_id, text) +
    * components view (doc_id, component) → view (component,
    * cluster_size, rep_id, rep_len) — q232 (round 10). */
  def createClusterRepsView(spark: SparkSession, docsView: String,
      compsView: String, viewName: String): Unit =
    Dedup.clusterReps(spark.table(docsView), spark.table(compsView))
      .createOrReplaceTempView(viewName)

  /** Dedup mixture impact: components view (doc_id, component) + meta
    * view (doc_id, source, len) → view (source, n_docs, n_removed,
    * removed_ppm, chars_total, chars_removed, chars_removed_ppm) —
    * q235 (round 10). */
  def createDedupImpactView(spark: SparkSession, compsView: String,
      metaView: String, viewName: String): Unit =
    Dedup.dedupImpact(spark.table(compsView), spark.table(metaView))
      .createOrReplaceTempView(viewName)

  /** Split-leakage audit: pairs view (doc_a, doc_b) + splits view
    * (doc_id, split) → view (split_a, split_b, n_pairs, share_ppm) —
    * q234 (round 10). */
  def createSplitLeakageView(spark: SparkSession, pairsView: String,
      splitsView: String, viewName: String): Unit =
    Dedup.splitLeakage(spark.table(pairsView), spark.table(splitsView))
      .createOrReplaceTempView(viewName)

  /** Cross-source contamination matrix: pairs view (doc_a, doc_b) +
    * sources view (doc_id, source) → view (source_a, source_b,
    * n_pairs) — q233 (round 10). */
  def createContaminationMatrixView(spark: SparkSession,
      pairsView: String, sourcesView: String, viewName: String): Unit =
    Dedup.contaminationMatrix(spark.table(pairsView),
      spark.table(sourcesView))
      .createOrReplaceTempView(viewName)

  /** ANN recall audit: exact and approximate top-k views (qid, rank,
    * neighbor, cos) → view (qid, n_brute, n_found, recall_ppm) — q239
    * (round 10). */
  def createAnnRecallView(spark: SparkSession, exactView: String,
      approxView: String, viewName: String): Unit =
    Similarity.annRecall(spark.table(exactView), spark.table(approxView))
      .createOrReplaceTempView(viewName)

  /** CDC apply / MERGE INTO: old-snapshot view + changelog view (key,
    * op ∈ {I,U,D}, new_* columns) → view of the reconstructed new
    * snapshot — q240 (round 10). */
  def createApplyCdcView(spark: SparkSession, oldView: String,
      diffView: String, key: String, valueCols: Seq[String],
      viewName: String): Unit =
    operators.Relational.applyCdc(spark.table(oldView),
      spark.table(diffView), key, valueCols)
      .createOrReplaceTempView(viewName)

  /** Shingle df spectrum of a docs view (doc_id, text) → view (bucket,
    * n_shingles, postings_mass) — q243 (round 10): the measurement
    * behind a df-cap choice. */
  def createDfSpectrumView(spark: SparkSession, docsView: String,
      viewName: String, cap: Long = 64L): Unit =
    Dedup.dfSpectrum(spark.table(docsView), cap)
      .createOrReplaceTempView(viewName)

  /** LSH banding sweep of a docs view (doc_id, text) → view (bands,
    * n_candidates, n_verified, precision_ppm) — q244 (round 10): the
    * measured banding S-curve. */
  def createBandingSweepView(spark: SparkSession, docsView: String,
      viewName: String, bandConfigs: Seq[Int] = Seq(8, 16, 32)): Unit =
    Dedup.bandingSweep(spark.table(docsView), bandConfigs)
      .createOrReplaceTempView(viewName)

  /** Any-length maximal duplicated-substring spans of a docs view
    * (doc_id, text) → view (doc_a, pos_a, doc_b, pos_b, span_len) —
    * q245 (round 11): suffix-array-grade exact-substring dedup via
    * L-gram grouping + diagonal islands. */
  def createSubstringSpansView(spark: SparkSession, docsView: String,
      viewName: String, minLen: Int = 8): Unit =
    CorpusPrep.substringDupSpans(spark.table(docsView), minLen)
      .createOrReplaceTempView(viewName)

  /** Batched BPE training of a docs view (doc_id, text) → view
    * (merge_round, merge_l, merge_r, weight) — q248 (round 11):
    * top-k conflict-free merges per round; k = 1 ≡ the sequential
    * trainer. */
  def createBatchedBpeMergesView(spark: SparkSession, docsView: String,
      viewName: String, rounds: Int = 3, k: Int = 2): Unit =
    TextOps.bpeTrainBatched(spark.table(docsView), rounds, k)
      .createOrReplaceTempView(viewName)

  /** Engine-replayable integer k-means of an embeddings view
    * (vec_id, embedding) → view (cell, dim, c_e3) of the trained
    * centroid table — q246 (round 11). */
  def createKmeansCentroidsView(spark: SparkSession, embView: String,
      viewName: String, k: Int = 8, rounds: Int = 3): Unit =
    Clustering.kMeansShared(spark.table(embView), k, rounds)._1
      .toDF("cell", "dim", "c_e3")
      .createOrReplaceTempView(viewName)

  /** Engine-replayable integer PRODUCT-QUANTIZATION codebooks of an
    * embeddings view (vec_id, embedding) → view (s, cell, dim, c_e3)
    * of the per-subspace trained codebook table — q282 (round 13):
    * the kMeansShared discipline with the subspace id in every
    * grouping key. */
  def createPqCodebooksView(spark: SparkSession, embView: String,
      viewName: String, subDim: Int = 16, kSub: Int = 8,
      rounds: Int = 2): Unit =
    Clustering.pqShared(spark.table(embView), subDim, kSub, rounds)._2
      .toDF("s", "cell", "dim", "c_e3")
      .createOrReplaceTempView(viewName)

  /** BM25 retrieval readout of a docs view (doc_id, text) → view
    * (rank, doc_id, score, n_terms) — q247 (round 11): fixed-point
    * BM25 over the mid-head query-term set, postings-bounded. */
  def createBm25View(spark: SparkSession, docsView: String,
      viewName: String, topK: Int = 20): Unit =
    TextOps.bm25TopDocs(spark.table(docsView), topK)
      .createOrReplaceTempView(viewName)

  /** BPE ENCODER from SQL — apply a merges view (merge_round, merge_l,
    * merge_r) to a docs view in table order; the resulting final
    * segmentation state registers as (w, c, pos, sym) — q249's
    * inference-side primitive. */
  def createBpeEncodeView(spark: SparkSession, docsView: String,
      mergesView: String, viewName: String): Unit = {
    val merges = spark.table(mergesView).orderBy("merge_round")
      .select("merge_l", "merge_r").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    TextOps.bpeEncodeState(spark.table(docsView), merges)
      .createOrReplaceTempView(viewName)
  }

  /** HITS hubs & authorities of an edges view (hub, auth) → two views
    * (hub, h) / (auth, a) in e6 — q250 (round 11). */
  def createHitsViews(spark: SparkSession, edgesView: String,
      hubViewName: String, authViewName: String,
      rounds: Int = 3): Unit = {
    val (hub, auth) = Graph.hits(spark.table(edgesView), rounds)
    hub.createOrReplaceTempView(hubViewName)
    auth.createOrReplaceTempView(authViewName)
  }

  /** Principal direction of an embeddings view (vec_id, embedding) →
    * view (dim, v_e6) — q251 (round 11). */
  def createPrincipalDirView(spark: SparkSession, embView: String,
      viewName: String, rounds: Int = 3): Unit =
    Similarity.principalDirection(spark.table(embView), rounds)
      .createOrReplaceTempView(viewName)

  /** Multi-query BM25 over a docs view (doc_id, text) and a query
    * view (query_id, term) → view (query_id, rank, doc_id, score,
    * n_terms) — q255 (round 12): the batched-serving shape. */
  def createBm25MultiView(spark: SparkSession, docsView: String,
      queryView: String, viewName: String, topK: Int = 10): Unit =
    TextOps.bm25TopDocsMulti(spark.table(docsView),
      spark.table(queryView), topK)
      .createOrReplaceTempView(viewName)

  /** Postings delta between a base docs view and a next-snapshot docs
    * view is the q261 shape; this builder diffs the base view against
    * its derived snapshot → view (doc_id, n_added, n_removed, status)
    * — q261 (round 12). */
  def createPostingsDeltaView(spark: SparkSession, docsView: String,
      viewName: String): Unit =
    TextOps.postingsDelta(spark.table(docsView))
      .createOrReplaceTempView(viewName)

  /** Katz centrality of an undirected edges view (u, v) → view
    * (node, score) — q262 (round 12). */
  def createKatzView(spark: SparkSession, edgesView: String,
      viewName: String, iters: Int = 3): Unit =
    operators.Graph.katzCentrality(spark.table(edgesView), iters)
      .createOrReplaceTempView(viewName)

  /** Int8 quantization error audit of an embeddings view
    * (vec_id, label, embedding) → per-label error-budget view —
    * q264 (round 12). */
  def createQuantAuditView(spark: SparkSession, embView: String,
      viewName: String): Unit =
    Similarity.quantAudit(spark.table(embView))
      .createOrReplaceTempView(viewName)

  /** Quality-classifier scores for a (doc_id, text) view — q272's
    * hashed-n-gram integer linear scorer (round 13): per doc token/
    * feature counts, raw + mean score, keep flag. */
  def createQualityScoreView(spark: SparkSession, docsView: String,
      viewName: String): Unit =
    operators.CorpusPrep.qualityScore(spark.table(docsView))
      .createOrReplaceTempView(viewName)

  /** Per-doc bigram mean-surprisal score + keep flag for a
    * (doc_id, text) view — q294's perplexity-surrogate scorer
    * (round 14), the LM-filter sibling of [[createQualityScoreView]]. */
  def createSurprisalScoreView(spark: SparkSession, docsView: String,
      viewName: String): Unit =
    operators.CorpusPrep.surprisalScore(spark.table(docsView))
      .createOrReplaceTempView(viewName)

  /** Pseudo-relevance-feedback expanded BM25 top-20 for a
    * (doc_id, text) view — q275's two-stage RM3-lite loop
    * (round 13). */
  def createPrfExpansionView(spark: SparkSession, docsView: String,
      viewName: String): Unit =
    operators.TextOps.prfExpansion(spark.table(docsView))
      .createOrReplaceTempView(viewName)

  /** Perceptual near-dup pairs for a (media_id, phash) signature view
    * — qm7's Hamming banding + exact bit_count verify (round 13),
    * expressed directly in SQL over the signature table so any
    * signature source (dHash, simhash) can ride it. Round 14:
    * parameterized by band count (must divide 56; 2/4/7/8/14 all do)
    * — B bands of 56/B bits guarantee recall 1 within Hamming B−1
    * (pigeonhole), the trade qm9 measures. */
  def createPhashNearDupView(spark: SparkSession, sigView: String,
      viewName: String, maxHamming: Int = 6, nBands: Int = 4): Unit = {
    require(nBands >= 1 && 56 % nBands == 0, s"bands must divide 56")
    val w = 56 / nBands
    val divisors = (0 until nBands).map(b => s"${1L << (b * w)}L")
      .mkString("array(", ", ", ")")
    val bandIdx = (0 until nBands).mkString("array(", ", ", ")")
    spark.sql(
      s"""WITH bands AS (
         |  SELECT media_id, phash, b,
         |    (phash div element_at($divisors, b + 1)) % ${1L << w}
         |      AS bv
         |  FROM $sigView
         |  LATERAL VIEW explode($bandIdx) t AS b),
         |cand AS (
         |  SELECT DISTINCT x.media_id AS a, y.media_id AS b,
         |    x.phash AS pa, y.phash AS pb
         |  FROM bands x JOIN bands y
         |    ON x.b = y.b AND x.bv = y.bv AND x.media_id < y.media_id)
         |SELECT a, b, CAST(bit_count(pa ^ pb) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(pa ^ pb) <= $maxHamming"""
        .stripMargin).createOrReplaceTempView(viewName)
  }

  /** Quantile-sketch register cascade from SQL (q302, round 15): for
    * a (v, ok, ln) BIGINT values view, the deterministic MRL cascade
    * at the graded shard/budget config — the final compactor state
    * (kb, shard, v, ok, ln, w) as a view. ONE body with the gated
    * q302 state ([[operators.Percentiles.sketchFromValues]]). */
  def createQuantileSketchView(spark: SparkSession, valuesView: String,
      viewName: String): Unit =
    operators.Percentiles.sketchFromValues(spark.table(valuesView))
      .createOrReplaceTempView(viewName)

  /** Louvain one-level communities from SQL (q305, round 15) for a
    * (u, v) edges view — 3 synchronous integer-gain rounds. */
  def createLouvainView(spark: SparkSession, edgesView: String,
      viewName: String, rounds: Int = 3): Unit =
    operators.Graph.louvainRounds(spark.table(edgesView), rounds)
      .createOrReplaceTempView(viewName)

  /** Unigram-LM segmentation state from SQL (q304, round 15) for a
    * (text) docs view — per eligible word: (w, c, len, n, fs). */
  def createUnigramEncodeView(spark: SparkSession, docsView: String,
      viewName: String): Unit =
    operators.TextOps.uniStateOf(spark.table(docsView))
      .createOrReplaceTempView(viewName)

  /** SERP near-dup collapse from SQL (q301/round-15 serving twin):
    * a (orig_rank, doc_id, score) result-list view collapsed by a
    * (doc_id, component) label view. */
  def createSerpDedupView(spark: SparkSession, resultsView: String,
      componentsView: String, viewName: String): Unit =
    operators.Dedup.serpDedupCollapse(spark.table(resultsView),
        spark.table(componentsView))
      .createOrReplaceTempView(viewName)

  /** Decontamination overlap counts from SQL (q62/q306, round 15):
    * per doc of `docsView`, the distinct k-shingle overlap with
    * `benchView` — cut at any τ downstream (the q306 sweep reads one
    * view at several thresholds). */
  def createDecontamOverlapView(spark: SparkSession, docsView: String,
      benchView: String, k: Int, viewName: String): Unit =
    operators.Dedup.overlapCounts(spark.table(docsView),
        spark.table(benchView), k)
      .createOrReplaceTempView(viewName)

  /** WordPiece greedy segmentation from SQL (q312, round 16) for a
    * (text) docs view — per eligible word: (w, c, len, n); the same
    * shared vocab head the unigram view reads. */
  def createWordpieceEncodeView(spark: SparkSession, docsView: String,
      viewName: String): Unit =
    operators.TextOps.wordPieceOf(
        operators.TextOps.uniEdgesOf(spark.table(docsView)))
      .createOrReplaceTempView(viewName)

  /** DSIR importance weights + deterministic keep flags from SQL
    * (q313, round 16) for a (doc_id, text) docs view against a
    * (doc_id) target-ids view. */
  def createImportanceWeightsView(spark: SparkSession,
      docsView: String, targetIdsView: String, viewName: String): Unit =
    operators.CorpusPrep.importanceWeights(spark.table(docsView),
        spark.table(targetIdsView))
      .createOrReplaceTempView(viewName)

  /** Two-level Louvain from SQL (q311, round 16) for a (u, v) edges
    * view — per node: (community = level-1, c2 = level-2). */
  def createLouvainTwoLevelView(spark: SparkSession, edgesView: String,
      viewName: String): Unit = {
    val (_, _, _, map2) =
      operators.Graph.louvainTwoLevelOf(spark.table(edgesView))
    map2.createOrReplaceTempView(viewName)
  }

  /** Z-order layout from SQL: writes `srcView` to `path` laid out
    * along the (xCol, yCol) Z-curve (one range shuffle at ingest), and
    * registers the written files as `viewName` so subsequent SQL box
    * queries scan the skipping-friendly layout. */
  def zOrderWriteAsView(spark: SparkSession, srcView: String,
      xCol: String, yCol: String, bits: Int, numFiles: Int,
      path: String, viewName: String): Unit = {
    operators.ZOrder.zOrderWrite(spark.table(srcView), xCol, yCol,
      bits, numFiles, path)
    spark.read.parquet(path).createOrReplaceTempView(viewName)
  }
}
