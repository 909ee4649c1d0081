package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables.load

/** Corpus-preparation operators — the remaining per-document /
  * per-corpus transforms a pretraining data pipeline runs between raw
  * ingest and tokenization: text normalization, PII redaction,
  * sequence (context-window) packing, repetition-based quality
  * filtering, and stratified deterministic sampling.
  *
  * Scale notes: q64/q65/q67 are pure codegen'd projections (no
  * shuffle, pushdown-friendly); q66 is one window pass per shard (the
  * shard column bounds every reducer's state); q68 is a codegen'd
  * filter like q46. Nothing here collects to the driver.
  */
object CorpusPrep {

  // ---------------------------------------------------------------- q64

  /** Text normalization: lowercase, strip non-alphanumerics, collapse
    * runs of spaces, trim. The character-class regexes behave
    * identically under Java regex and RE2 (no lookaround, no
    * backreferences), so the transform is engine-portable — which is
    * the point: normalization output feeds exact dedup, and two
    * engines disagreeing on one byte would silently break dedup keys.
    * One codegen'd projection; at 100 TB this runs at scan speed. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(c), "[^a-z0-9 ]", ""), " +", " "))

  /** Q64: normalization demo over a deterministically-derived messy
    * input (the fixture corpus is already clean, so the query first
    * up-cases and injects punctuation/padding — both engines construct
    * the identical blob, then normalize it). */
  def q64Normalize(spark: SparkSession, dir: String): DataFrame = {
    val messy = concat(lit("  "), upper(col("text")), lit(" !! "),
      col("text"), lit("  "))
    load(spark, dir, "documents")
      .select(col("doc_id"), normalizeText(messy).as("norm"))
      .withColumn("n_chars", length(col("norm")).cast(LongType))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- q65

  /** PII redaction: replace emails, US-style SSNs, and phone numbers
    * with typed placeholders. SSN before phone: the phone pattern's
    * digit-group shape would otherwise eat the tail of an SSN.
    * Patterns are RE2-safe (classes + bounded quantifiers only) for
    * the same engine-portability reason as [[normalizeText]]. */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val SsnRe = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
  val PhoneRe = "\\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}"

  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "[EMAIL]"),
        SsnRe, "[SSN]"),
      PhoneRe, "[PHONE]")

  /** Q65: redact a deterministically-constructed contact blob per
    * customer (the fixture has no PII columns; both engines build the
    * same blob). Emits the pre-redaction match count so the oracle
    * also pins the DETECTORS, not just the replaced text. */
  def q65PiiRedact(spark: SparkSession, dir: String): DataFrame = {
    val blob = concat(lit("contact "), col("c_name"), lit(" at user"),
      col("c_custkey").cast("string"), lit("@example.com or +1-555-"),
      lpad((col("c_custkey") % 10000).cast("string"), 4, "0"),
      lit(" ssn 123-45-6789"))
    load(spark, dir, "customer")
      .select(col("c_custkey").as("id"), blob.as("blob"))
      .select(col("id"),
        redactPii(col("blob")).as("redacted"),
        (regexp_count(col("blob"), lit(EmailRe)) +
          regexp_count(col("blob"), lit(SsnRe)) +
          regexp_count(col("blob"), lit(PhoneRe))).cast(LongType)
          .as("pii_found"))
      .orderBy("id")
  }

  // ---------------------------------------------------------------- q259

  /** Q259: PII DETECTION AUDIT — per customer nation, how many rows
    * trip each detector class ([[EmailRe]]/[[PhoneRe]]/[[SsnRe]]) and
    * the any-PII rate in bp. q65 REDACTS a blob where every row
    * carries all three classes; the audit needs VARIANCE, so presence
    * is data-dependent (custkey mod 3/5/7 gates each class — both
    * engines derive the identical blob) — the governance readout a
    * privacy review reads per data region before release.
    *
    * Scale: pure codegen'd regexp projections + one small-keyed
    * rollup; at 100 TB this runs at scan speed like q65. */
  def q259PiiAudit(spark: SparkSession, dir: String): DataFrame = {
    val blob = concat(lit("row "), col("c_name"),
      when(col("c_custkey") % 3 === 0, concat(lit(" user"),
        col("c_custkey").cast("string"), lit("@example.com")))
        .otherwise(lit("")),
      when(col("c_custkey") % 5 === 0, concat(lit(" +1-555-"),
        lpad((col("c_custkey") % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")),
      when(col("c_custkey") % 7 === 0, lit(" ssn 123-45-6789"))
        .otherwise(lit("")))
    load(spark, dir, "customer")
      .select(col("c_nationkey").cast(LongType).as("nation"),
        regexp_count(blob, lit(EmailRe)).cast(LongType).as("em"),
        regexp_count(blob, lit(PhoneRe)).cast(LongType).as("ph"),
        regexp_count(blob, lit(SsnRe)).cast(LongType).as("ss"))
      .groupBy("nation")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("em")).as("email_hits"),
        sum(col("ph")).as("phone_hits"),
        sum(col("ss")).as("ssn_hits"),
        sum(when(col("em") + col("ph") + col("ss") > 0, 1L)
          .otherwise(0L)).as("n_any"))
      .select(col("nation"), col("n_rows"), col("email_hits"),
        col("phone_hits"), col("ssn_hits"),
        expr("(n_any * 10000) div n_rows").as("any_pii_bp"))
      .orderBy("nation")
  }

  // ---------------------------------------------------------------- q260

  /** Q260: MIXTURE UNDER A TOKEN BUDGET — the data-mixing decision
    * readout: sources ranked by a quality score (distinct-word ppm of
    * token volume — the TTR signal, richer text first), then greedily
    * allocated whole into a 40%-of-corpus token budget; the source
    * that overflows takes the remainder, later sources take 0. Emits
    * per source: quality, volume, cumulative position, allocated
    * tokens and the taken share in bp — the table a mixture
    * negotiation starts from (q71 hits a TARGET mixture; this SPENDS
    * a budget quality-first).
    *
    * Scale: per-source aggregates are partial-combining; the greedy
    * scan is a cumsum window over #sources rows (tiny by
    * construction); budget rides a broadcast 1-row frame. */
  def q260MixtureBudget(spark: SparkSession, dir: String): DataFrame = {
    val per = load(spark, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy("source")
      .agg(count(lit(1)).as("toks"),
        countDistinct(col("w")).as("dw"))
      .withColumn("quality_ppm", expr("(dw * 1000000) div toks"))
    val budget = per.agg(expr("(sum(toks) * 2) div 5").as("budget"))
    val w = Window.orderBy(col("quality_ppm").desc, col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    per.crossJoin(broadcast(budget))
      .withColumn("cum_tokens", sum(col("toks")).over(w))
      .withColumn("alloc", greatest(lit(0L),
        least(col("toks"), col("budget") - (col("cum_tokens") - col("toks")))))
      .select(col("source"), col("quality_ppm"), col("toks"),
        col("cum_tokens"), col("alloc"),
        expr("(alloc * 10000) div toks").as("taken_bp"))
      .orderBy(col("quality_ppm").desc, col("source"))
  }

  // ---------------------------------------------------------------- q272

  /** Q272: QUALITY-CLASSIFIER SCORING (round 13 — verdict-r12 item
    * 5): a fastText-style linear classifier over HASHED n-gram
    * features, all-integer so both engines replay it exactly. Features
    * = word unigrams + bigrams hashed into 64 buckets via the
    * engine-shared polyhash word folds (unigram bucket = h1 mod 64;
    * bigram bucket = (h1ᵢ·131 + h1ᵢ₊₁) mod (10⁹+7) mod 64 — the
    * [[sqlGramKey]] fold at n = 2, reduced mod the bucket count);
    * weights = a deterministic BIGINT literal table ([[qsWeights]],
    * the "trained model" stand-in — swapping in real trained weights
    * changes one literal). Per doc: token count, feature count, raw
    * score, mean score (e3) and the keep flag (mean ≥ 0) — the
    * predicate a production corpus filter runs INSTEAD of hand rules
    * (tx2/q67's length-and-ratio heuristics); it composes into q63's
    * filter stage as a drop-in alternative (same (doc_id, keep)
    * shape).
    *
    * Scale: ZERO shuffle — the scorer is a pure per-row projection
    * (word-fold arrays + two HOF folds); at 100 TB it runs at scan
    * speed with no aggregation state at all. QualitySpec pins
    * score ≡ a pure-Scala driver replay on a literal corpus. */
  private[graft] val qsWeights: Seq[Long] =
    (0 until 64).map(b => ((b * 1103515245L + 12345L) % 2001L) - 1000L)

  def qualityScore(docs: DataFrame): DataFrame = {
    graft.functions.SignatureExprs.register(docs.sparkSession)
    val wlit = typedlit(qsWeights)
    def bucketW(idx: Column): Column = element_at(wlit, idx.cast("int") + 1)
    docs
      .select(col("doc_id"),
        transform(split(col("text"), " "),
          wd => call_function("graft_polyhash", wd)).as("h1"))
      .select(col("doc_id"),
        size(col("h1")).cast("long").as("n_tokens"),
        (aggregate(
          transform(col("h1"), h => bucketW(h % 64L)),
          lit(0L), (acc, x) => acc + x) +
          // Spark sequence(1, 0) counts DOWN — the size ≥ 2 guard is
          // load-bearing (q145's rule); DuckDB range(1, 1) is empty,
          // so the guard changes nothing there.
          when(size(col("h1")) >= 2, aggregate(
            transform(sequence(lit(1), size(col("h1")) - 1),
              i => bucketW((element_at(col("h1"), i) * 131L +
                element_at(col("h1"), i + 1)) % 1000000007L % 64L)),
            lit(0L), (acc, x) => acc + x)).otherwise(lit(0L)))
          .as("score"))
      .withColumn("n_feats",
        col("n_tokens") + greatest(col("n_tokens") - 1L, lit(0L)))
      .withColumn("mean_e3",
        expr("(score * 1000) div greatest(n_feats, 1)"))
      .withColumn("keep",
        when(col("mean_e3") >= 0, 1L).otherwise(0L))
      .select(col("doc_id"), col("n_tokens"), col("n_feats"),
        col("score"), col("mean_e3"), col("keep"))
  }

  def q272QualityScore(spark: SparkSession, dir: String): DataFrame =
    qualityScore(load(spark, dir, "documents")).orderBy("doc_id")

  /** Q279: QUALITY-SCORE DISTRIBUTION BY SOURCE (round 13) — exact
    * p10/p50/p90 of the q272 mean score per source (q87's percentile
    * machinery over the classifier's output): the calibration table a
    * keep-threshold is chosen FROM — a source whose p50 sits below
    * the global cut is about to be silently dropped wholesale, and
    * this is where that shows before the filter runs.
    *
    * Scale: the scorer is zero-shuffle; the percentile selection is
    * the q42/q87 rank-split discipline (no whole-group in-heap
    * buffers). */
  def q279QualityDeciles(spark: SparkSession, dir: String): DataFrame = {
    val docs = load(spark, dir, "documents")
    // checkpoint the slim (source, mean_e3) frame: the rank machinery
    // takes several window passes, and projection collapse would
    // inline the scorer's per-row fold HOF into each (measured 4.5 s
    // → sub-second)
    val scored = qualityScore(docs)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .select(col("source"), col("mean_e3"))
      .localCheckpoint()
    Percentiles.discByRank(scored, Seq("source"), "mean_e3",
        Seq(0.1 -> "p10", 0.5 -> "p50", 0.9 -> "p90"), Some("n_docs"))
      .orderBy("source")
  }

  // ---------------------------------------------------------------- q294

  /** The q294 keep threshold in e6 surprisal units — measured p90 of
    * the fixture's per-doc mean (a doc whose bigrams are on average
    * 32× less probable than its unigram mass predicts is flagged as
    * disfluent). ONE source for both engines (interpolated into the
    * oracle SQL, lit() on the Spark side). */
  private[graft] val surpKeepE6: Long = 32000000L

  /** Q294: PERPLEXITY-SURROGATE QUALITY SCORER — the production
    * workhorse q272's hashed-feature classifier doesn't cover: an
    * n-gram LM score (KenLM-style). q149's corpus-trained bigram
    * surprisal (integer inverse conditional probability
    * ⌊n(w₁)·10⁶ div n(w₁w₂)⌋, monotone in −log p(w₂|w₁) — log-free,
    * engine-exact) lifted to a TOTAL per-doc score table: every doc
    * gets (n_bigrams, surp_mean, keep), docs with < 2 words score 0
    * (trivially fluent — kept), and keep = surp_mean < [[surpKeepE6]]
    * is the fluency filter pipeline v3 composes with the classifier.
    *
    * Scale: bigram counts are a partial-combining (wa, wb) agg; the
    * score join is bigram-keyed (shuffle carries two words + counts,
    * never documents); the final left join restores no-bigram docs. */
  def surprisalScore(docs: DataFrame): DataFrame = {
    val ws = docs.select(col("doc_id"), split(col("text"), " ").as("w"))
    val bigr = ws.filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(w) - 1)," +
          " i -> struct(element_at(w, i) AS wa," +
          " element_at(w, i + 1) AS wb))")).as("p"))
      .select(col("doc_id"), col("p.wa").as("wa"), col("p.wb").as("wb"))
    val uni = ws.select(explode(col("w")).as("wa"))
      .groupBy("wa").agg(count(lit(1)).as("na"))
    val bc = bigr.groupBy("wa", "wb").agg(count(lit(1)).as("nab"))
    val sc = bigr.join(bc, Seq("wa", "wb")).join(uni, "wa")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(expr("(na * 1000000) div nab")).as("surp_sum"))
    docs.select("doc_id").join(sc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(expr("surp_sum div n_bigrams"), lit(0L))
          .as("surp_mean"))
      .withColumn("keep",
        when(col("surp_mean") < surpKeepE6, 1L).otherwise(0L))
  }

  def q294SurprisalScore(spark: SparkSession, dir: String): DataFrame =
    surprisalScore(load(spark, dir, "documents")).orderBy("doc_id")

  // ---------------------------------------------------------------- q313

  /** DSIR-STYLE IMPORTANCE WEIGHTS + deterministic resampling (round
    * 15 verdict item 4; Xie et al. 2023, "Data Selection for Language
    * Models via Importance Resampling", public) — the data-SELECTION
    * operator the quality-filter family was missing: score each doc by
    * how much more its hashed n-gram features look like a TARGET
    * domain than like the corpus at large, then keep docs with
    * probability proportional to that weight.
    *
    * The gateable integer surrogate:
    *  - features = the q272 classifier's hashed uni+bigram buckets
    *    (engine-shared polyhash word folds; bigram fold ·131 mod
    *    10⁹+7; 64 buckets) — DSIR's hashed-n-gram feature map with the
    *    repo's one hash family;
    *  - per bucket, the importance ratio p_tgt/p_all as the q80-style
    *    cross-multiplied chain with each step BOUNDED: ratio_e6 =
    *    (c_tgt·10⁶) div c_all ≤ 10⁶ (target ⊆ corpus, so c_tgt ≤
    *    c_all), then lift_e6 = (ratio_e6·n_all) div n_tgt — overflow-
    *    free to n_all ≈ 9·10¹² features (≈ 50 TB of text; past that,
    *    divide n_all/n_tgt first — documented, not needed here);
    *  - per doc, w_e6 = mean lift over its feature OCCURRENCES (the
    *    surprisal-mean discipline; length-unbiased);
    *  - keep = DETERMINISTIC importance resampling under the q103
    *    rule: bucket₂₀(doc_id)·max_w < w_e6·2²⁰ — keep probability
    *    ∝ weight, a pure function of the row key (reproducible across
    *    runs/engines/partitionings, like every sampler here).
    *
    * Scale: bucket counts are 64-row partial-combining aggs; the lift
    * table broadcasts (64 rows); the per-doc mean is one doc-keyed
    * agg over the feature stream; max_w is a 1-row broadcast. Nothing
    * holds a document's text past the fold projection. */
  def importanceWeights(docs: DataFrame, targetIds: DataFrame)
      : DataFrame = {
    graft.functions.SignatureExprs.register(docs.sparkSession)
    val feats = docs
      .select(col("doc_id"),
        transform(split(col("text"), " "),
          wd => call_function("graft_polyhash", wd)).as("h1"))
      .select(col("doc_id"), explode(concat(
        transform(col("h1"), h => h % 64L),
        // sequence(1, 0) counts DOWN — the size ≥ 2 guard is
        // load-bearing (q145's rule); DuckDB range(1, 1) is empty.
        when(size(col("h1")) >= 2,
          transform(sequence(lit(1), size(col("h1")) - 1),
            i => (element_at(col("h1"), i) * 131L +
              element_at(col("h1"), i + 1)) % 1000000007L % 64L))
          .otherwise(typedlit(Seq.empty[Long])))).as("b"))
      .localCheckpoint() // c_all + c_tgt + the per-doc score join
    val ca = feats.groupBy("b").agg(count(lit(1)).as("c_all"))
    val ct = feats
      .join(targetIds.select("doc_id"), Seq("doc_id"), "left_semi")
      .groupBy("b").agg(count(lit(1)).as("c_tgt"))
    val tot = ca.agg(sum(col("c_all")).as("n_all"))
      .crossJoin(ct.agg(sum(col("c_tgt")).as("n_tgt")))
    val lift = ca.join(ct, Seq("b"), "left")
      .crossJoin(broadcast(tot))
      .select(col("b"),
        expr("(((coalesce(c_tgt, 0) * 1000000) div c_all) * n_all)" +
          " div n_tgt").as("lift_e6"))
    val dw = feats.join(broadcast(lift), "b")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"), sum(col("lift_e6")).as("lsum"))
    val scored = docs.select("doc_id").join(dw, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(expr("lsum div n_feats"), lit(0L)).as("w_e6"))
    val mx = scored.agg(max(col("w_e6")).as("mxw"))
    scored.crossJoin(broadcast(mx))
      .withColumn("kept",
        when(Sampling.md5Bucket20(col("doc_id")) * col("mxw") <
          col("w_e6") * lit(1048576L), 1L).otherwise(0L))
      .select(col("doc_id"), col("n_feats"), col("w_e6"), col("kept"))
  }

  /** Q313: the importance table over the base corpus with target =
    * the English slice (the "I want more of THIS distribution"
    * domain; lang is the fixture's domain axis). Output per doc:
    * feature count, weight (e6), and the deterministic kept flag. */
  def q313ImportanceSample(spark: SparkSession, dir: String)
      : DataFrame = {
    val docs = load(spark, dir, "documents")
    importanceWeights(docs.select("doc_id", "text"),
      docs.filter(col("lang") === "en").select("doc_id"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- q66

  /** Sequence packing — the GPT-style concat-and-chunk pack: per
    * shard, documents are concatenated in id order and the token
    * stream is cut every `window` tokens; a document belongs to the
    * chunk its FIRST token lands in. Returns per-document (shard,
    * chunk, start offset), from which per-chunk stats aggregate.
    *
    * Scale: one window pass partitioned by the shard column — the
    * running sum is a streaming frame (no per-group buffering beyond
    * the frame row), and shards are independent, so 100 TB packs as
    * thousands of parallel shard streams. A GLOBAL pack (no shard
    * column) would serialize the cumsum into one ordered pass —
    * that is exactly why production packers shard first; the shard
    * column here is the explicit knob. */
  def packSequences(docs: DataFrame, shardCol: String, idCol: String,
      tokensCol: Column, window: Int): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col(shardCol).as("shard"), col(idCol).as("doc_id"),
      tokensCol.cast(LongType).as("tokens"))
      .withColumn("start", sum(col("tokens")).over(w) - col("tokens"))
      .withColumn("chunk", expr(s"start div $window"))
  }

  /** Q66: pack each source's documents into 512-token context windows;
    * per-chunk doc/token counts and id range. */
  def q66SeqPack(spark: SparkSession, dir: String): DataFrame =
    packSequences(load(spark, dir, "documents"), "source", "doc_id",
      size(split(col("text"), " ")), 512)
      .groupBy(col("shard").as("source"), col("chunk"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tokens")).as("tok_sum"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .select(col("source"), col("chunk"), col("n_docs"), col("tok_sum"),
        col("first_doc"), col("last_doc"))
      .orderBy("source", "chunk")

  // ---------------------------------------------------------------- q257

  /** Q257: PACKING BOUNDARY AUDIT — what the q66 concat-and-chunk pack
    * COSTS: per source, how many documents straddle a 512-token chunk
    * boundary (a straddling doc is split across training sequences —
    * truncated context on one side, mid-document start on the other),
    * the split rate in ppm, chunks used, and fill. Concat packing is
    * always 100%-full except the final chunk (fill_ppm states it);
    * the split rate is the real quality knob a packer tunes window
    * size / shard grouping against.
    *
    * Scale: rides [[packSequences]]'s one window pass per shard; the
    * audit is a per-source aggregate over per-doc (start, tokens)
    * rows — no new shuffle shape. */
  def q257PackAudit(spark: SparkSession, dir: String): DataFrame =
    packSequences(load(spark, dir, "documents"), "source", "doc_id",
      size(split(col("text"), " ")), 512)
      .withColumn("lastc", expr("(start + tokens - 1) div 512"))
      .groupBy(col("shard").as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tokens")).as("tok_sum"),
        sum(when(col("lastc") =!= col("chunk"), 1L).otherwise(0L))
          .as("n_split"),
        (max(col("lastc")) + 1L).as("n_chunks"))
      .select(col("source"), col("n_docs"), col("tok_sum"),
        col("n_split"),
        expr("(n_split * 1000000) div n_docs").as("split_ppm"),
        col("n_chunks"),
        expr("(tok_sum * 1000000) div (n_chunks * 512)").as("fill_ppm"))
      .orderBy("source")

  // ---------------------------------------------------------------- q258

  /** Q258: CONTEXT-LENGTH BUDGET SWEEP — for candidate context sizes
    * {128, 256, 512, 1024}, what each costs on this corpus when every
    * document becomes ONE (truncated, padded) sequence: docs over the
    * limit, tokens lost to truncation, pad tokens wasted under the
    * limit, and utilization in ppm. THE table a context-size decision
    * is read from (the complementary readout to q66/q257: those
    * measure packing, this measures the no-packing baseline that
    * fine-tuning pipelines actually run).
    *
    * Scale: one scan; the 4-config fan-out is a per-row explode of a
    * 4-element literal; per-config rollups are partial-combining. */
  def q258ContextSweep(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")
      .select(size(split(col("text"), " ")).cast(LongType).as("toks"))
      .select(col("toks"), explode(typedlit(
        Seq(128L, 256L, 512L, 1024L))).as("ctx"))
      .groupBy("ctx")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("tok_sum"),
        sum(when(col("toks") > col("ctx"), 1L).otherwise(0L))
          .as("n_truncated"),
        sum(greatest(col("toks") - col("ctx"), lit(0L)))
          .as("tokens_lost"),
        sum(greatest(col("ctx") - col("toks"), lit(0L)))
          .as("pad_waste"),
        sum(least(col("toks"), col("ctx"))).as("kept"))
      .select(col("ctx"), col("n_docs"), col("n_truncated"),
        expr("(n_truncated * 1000000) div n_docs").as("truncated_ppm"),
        col("tokens_lost"), col("pad_waste"),
        expr("(kept * 1000000) div (n_docs * ctx)")
          .as("utilization_ppm"))
      .orderBy("ctx")

  // ---------------------------------------------------------------- q67

  /** Repetition-based quality metrics (the Gopher-style repetition
    * filters — Rae et al. 2021, public): duplicate-word and
    * duplicate-bigram fractions per document, in exact basis points
    * (integer div, D6), plus the keep/drop verdict at a 2000 bp
    * bigram-repetition threshold. Pure per-row list expressions — no
    * explode, no shuffle; at 100 TB this is scan-speed map work. */
  def repetitionMetrics(docs: DataFrame, thresholdBp: Int = 2000)
      : DataFrame = {
    // Materialize the token array ONCE per row (a naive inline form
    // re-evaluates split() inside every element_at of the bigram
    // lambda — hundreds of splits per row; CollapseProject keeps the
    // staged projection because `w` is non-cheap and multiply used).
    // Bigrams via zip_with over two slices: one pass, no per-index
    // element_at.
    docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= lit(2))
      .withColumn("bg", zip_with(
        slice(col("w"), lit(1), size(col("w")) - 1),
        slice(col("w"), lit(2), size(col("w")) - 1),
        (a, b) => concat_ws(" ", a, b)))
      .select(col("doc_id"),
        size(col("w")).cast(LongType).as("n_words"),
        size(array_distinct(col("w"))).cast(LongType).as("d_words"),
        size(col("bg")).cast(LongType).as("n_bigrams"),
        size(array_distinct(col("bg"))).cast(LongType).as("d_bigrams"))
      .withColumn("dup_word_bp",
        expr("((n_words - d_words) * 10000) div n_words"))
      .withColumn("dup_bigram_bp",
        expr("((n_bigrams - d_bigrams) * 10000) div n_bigrams"))
      .withColumn("kept",
        when(col("dup_bigram_bp") < thresholdBp, 1L).otherwise(0L))
  }

  def q67Repetition(spark: SparkSession, dir: String): DataFrame =
    repetitionMetrics(load(spark, dir, "documents"))
      .orderBy("doc_id")

  // ---------------------------------------------------------------- q68

  /** Stratified deterministic sampling: per-stratum keep rates in
    * 16ths over the same md5-nibble bucket as [[Sampling.md5Bucket]]
    * — membership is a pure function of (key, stratum), so per-class
    * rebalancing (downsample the dominant language, keep all of a
    * rare one) is reproducible across runs, engines, and cluster
    * sizes. Codegen'd filter, no shuffle, no state. */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
      sixteenths: Map[String, Int], default: Int): DataFrame = {
    require((sixteenths.values ++ Seq(default)).forall(b => b >= 0 && b <= 16),
      "rates are 0..16 sixteenths")
    // 1-based position of the bucket nibble in the hex alphabet ==
    // its numeric value + 1 (matches the oracle's strpos form).
    val pos = conv(Sampling.md5Bucket(col(keyCol)), 16, 10)
      .cast(LongType) + lit(1)
    val rate = sixteenths.foldLeft(lit(default)) { case (acc, (s, b)) =>
      when(col(strataCol) === s, lit(b)).otherwise(acc)
    }
    df.filter(pos <= rate)
  }

  /** Q68: language-stratified sample — halve English, keep less of the
    * mid languages, nearly drop Chinese. */
  def q68StratSample(spark: SparkSession, dir: String): DataFrame =
    stratifiedSample(load(spark, dir, "documents"), "lang", "doc_id",
      Map("en" -> 8, "de" -> 4, "fr" -> 4, "es" -> 2, "zh" -> 1),
      default = 0)
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")

  // ---------------------------------------------------------------- q69

  /** Document chunking — overlapping fixed-size character windows (the
    * RAG / context-window prep step): starts at 0, stride, 2·stride, …
    * while inside the document; each chunk takes `window` chars (the
    * last one truncates). `sequence` + `explode` keeps this a pure
    * per-row expansion — no shuffle, no state; at 100 TB chunking runs
    * at scan speed and the output inherits the input's partitioning. */
  def chunkDocuments(docs: DataFrame, window: Int, stride: Int)
      : DataFrame = {
    require(window > 0 && stride > 0, "window and stride are positive")
    docs
      .filter(col("n_chars") >= 1) // ANSI: sequence(0,-1,+s) would throw
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0L), col("n_chars") - 1,
          lit(stride.toLong))).as("start"))
      .select(col("doc_id"),
        expr(s"start div $stride").as("chunk_idx"),
        col("text").substr(col("start").cast("int") + 1, lit(window))
          .as("chunk"))
      .withColumn("chunk_len", length(col("chunk")).cast(LongType))
  }

  def q69Chunk(spark: SparkSession, dir: String): DataFrame =
    chunkDocuments(load(spark, dir, "documents"), window = 200,
      stride = 150)
      .orderBy("doc_id", "chunk_idx")

  // ---------------------------------------------------------------- q70

  /** Duplicated-span coverage — the exact corpus-level repetition
    * metric behind suffix-array span dedup (Lee et al. 2021, public):
    * for word k-grams, how much of each document consists of spans
    * that occur elsewhere in the corpus (global occurrence ≥ 2).
    * Unlike q67 (within-document repetition) this is CROSS-document:
    * positions → global k-gram counts → join back → per-doc coverage.
    *
    * Scale: the exploded gram stream shuffles (gram, count) with
    * map-side partial aggregation; the count join is gram-keyed (both
    * sides already hashed on gram) and the per-doc rollup shuffles
    * slim (doc_id, flags) pairs. No driver state, no all-pairs. */
  /** Engine-shared PACKED DOUBLE-FOLD gram keys (round 12 — the q245
    * key machinery factored out for the whole span/overlap family):
    * per word-n-gram position, ONE BIGINT key
    * k₁·(10⁹+9) + k₂ where k₁/k₂ fold the n per-word char hashes
    * (graft_polyhash base 31 mod 10⁹+7 / graft_polyhash2 base 37 mod
    * 10⁹+9) base 131/137 under the matching modulus. Shuffle rows
    * carry 8 bytes instead of the n-word STRING (~6–10× narrower at
    * n = 5); joint collision ~10⁻¹⁸ per pair, and the DuckDB oracles
    * replay both folds so the key space is shared, never private.
    * Output: (passCols…, pos 1-based BIGINT, gk BIGINT). */
  /** WHOLE-TEXT packed double fold — the round-13 closure of the last
    * two text-keyed gated shuffles (q78's dup window, q63's exact-dedup
    * stage): one BIGINT key
    * `graft_polyhash(text)·(10⁹+9) + graft_polyhash2(text)`
    * (~10⁻¹⁸ joint collision; max value (10⁹+6)·(10⁹+9)+(10⁹+8) ≈
    * 1.0·10¹⁸ < 2⁶³, ANSI-safe). Shuffles carry 8 bytes instead of
    * the document BODY, and the DuckDB oracles replay both folds via
    * [[sqlTextFold]] — the 100 TB hash-first form IS the gated form
    * (the xxhash64 comment-trade is gone). Callers must
    * SignatureExprs.register the session first. */
  private[graft] def textFoldKey(c: Column): Column =
    call_function("graft_polyhash", c) * 1000000009L +
      call_function("graft_polyhash2", c)

  /** DuckDB replay of [[textFoldKey]] over a text expression `t` —
    * the whole-string char-codepoint twin of [[sqlWordFolds]] +
    * [[sqlGramKey]] (same bases/moduli, rendered ONCE). */
  private[graft] def sqlTextFold(t: String): String =
    s"""(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(1, len($t) + 1),
       |        i -> CAST(ord(substr($t, i, 1)) AS BIGINT))),
       |      (h, c) -> (h * 31 + c) % 1000000007) * 1000000009
       |    + list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(1, len($t) + 1),
       |        i -> CAST(ord(substr($t, i, 1)) AS BIGINT))),
       |      (h, c) -> (h * 37 + c) % 1000000009))""".stripMargin

  private[graft] def gramKeyStream(docs: DataFrame, n: Int,
      passCols: Seq[String]): DataFrame = {
    require(n >= 2)
    graft.functions.SignatureExprs.register(docs.sparkSession)
    val P1 = 1000000007L
    val P2 = 1000000009L
    val pcs = passCols.map(col)
    val ws = docs.select(pcs :+ split(col("text"), " ").as("w"): _*)
      .filter(size(col("w")) >= n)
      .select(pcs ++ Seq(
        transform(col("w"),
          wd => call_function("graft_polyhash", wd)).as("h1"),
        transform(col("w"),
          wd => call_function("graft_polyhash2", wd)).as("h2")): _*)
    def gramFold(arr: String, base: Long, p: Long, i: Column): Column =
      (0 until n).foldLeft(lit(0L): Column) { (acc, j) =>
        (acc * base + element_at(col(arr), i + j)) % p
      }
    ws.select(pcs :+
      posexplode(transform(
        sequence(lit(1), size(col("h1")) - (n - 1)),
        i => gramFold("h1", 131L, P1, i) * P2 +
          gramFold("h2", 137L, P2, i)))
        .as(Seq("p0", "gk")): _*)
      .select(pcs ++ Seq((col("p0") + 1).cast(LongType).as("pos"),
        col("gk")): _*)
  }

  def dupSpans(docs: DataFrame, k: Int = 5): DataFrame = {
    val grams = gramKeyStream(docs, k, Seq("doc_id"))
      .select(col("doc_id"), col("gk"))
    val counts = grams.groupBy("gk").agg(count(lit(1)).as("cnt"))
    grams.join(counts, "gk")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("cnt") >= 2, 1L).otherwise(0L)).as("dup_grams"))
      .withColumn("dup_bp", expr("(dup_grams * 10000) div n_grams"))
  }

  def q70DupSpans(spark: SparkSession, dir: String): DataFrame =
    dupSpans(load(spark, dir, "documents")).orderBy("doc_id")

  // ---------------------------------------------------------------- q77

  /** Span-REMOVAL dedup — the operation q70's metric exists to drive
    * (Lee et al. 2021: delete duplicated spans, keep the rest): every
    * word position covered by a word-k-gram that occurs ≥ 2 times
    * corpus-wide is dropped; the surviving words reassemble in order.
    * Documents too short to carry a k-gram pass through verbatim (via
    * the same split→join canonicalization, so output text is uniformly
    * single-spaced on both engines).
    *
    * Scale shape: positions and grams explode per row; gram counts
    * partial-combine; the covered-position set is a (doc_id, idx)
    * DISTINCT off the dup-gram join (≤ k rows per dup gram occurrence);
    * survivors are one anti-join on (doc_id, idx); reassembly is a
    * per-doc hash agg whose buffer is the document itself (bounded by
    * max doc length, not corpus size). No driver state, nothing
    * quadratic. */
  def removeDupSpans(docs: DataFrame, k: Int = 5): DataFrame = {
    val ws = docs.select(col("doc_id"), split(col("text"), " ").as("w"))
    val words = ws.select(col("doc_id"),
      posexplode(col("w")).as(Seq("idx", "word")))
    // gram shuffle keys = the packed double fold (round 12); the
    // covered-position expansion only needs (doc_id, p0), never text
    val grams = gramKeyStream(docs, k, Seq("doc_id"))
      .select(col("doc_id"), (col("pos") - 1).as("p0"), col("gk"))
    val dupGrams = grams.groupBy("gk").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2)
    val covered = grams.join(dupGrams, "gk")
      .select(col("doc_id"),
        explode(sequence(col("p0"), col("p0") + (k - 1))).as("idx"))
      .distinct()
    val kept = words.join(covered, Seq("doc_id", "idx"), "left_anti")
      .groupBy("doc_id")
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("idx"), col("word")))),
          x => x("word")), " ").as("clean_text"),
        count(lit(1)).as("n_kept"))
    docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast(LongType).as("n_words"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_words") - coalesce(col("n_kept"), lit(0L)))
          .as("n_removed"))
  }

  def q77SpanRemoval(spark: SparkSession, dir: String): DataFrame =
    removeDupSpans(load(spark, dir, "documents")).orderBy("doc_id")

  // ---------------------------------------------------------------- q245

  /** ANY-LENGTH duplicated-substring pairs — the suffix-array-grade
    * exact-substring method (Lee et al. 2021, public): every MAXIMAL
    * shared word-span of length ≥ `minLen` between two corpus
    * positions, with its TRUE extent —
    * (doc_a, pos_a, doc_b, pos_b, span_len). q70/q77 see fixed-k gram
    * coverage; this reports the spans themselves, any length (a
    * 12-word shared span is ONE row with span_len = 12, not a cloud
    * of overlapping k-grams).
    *
    * WHY NO SUFFIX SORT: the published method suffix-sorts the corpus
    * and scans ADJACENT suffixes for LCP ≥ L — an artifact of
    * sequential machines, where sorting is how you co-locate equal
    * prefixes. Two suffixes have LCP ≥ L **iff their first L words
    * are equal**, so the LCP ≥ L pair set is exactly the union over
    * L-gram types of within-type pairs: a hash GROUP BY on the
    * length-L prefix co-locates them with NO global sort and no
    * prefix-doubling rounds — Spark's native shape. Maximal extents
    * then fall out of the diagonal structure: a shared span of length
    * M ≥ L yields M − L + 1 consecutive L-gram matches at constant
    * diagonal (pos_a − pos_b), so gaps-and-islands per
    * (doc_a, doc_b, diagonal) recovers each maximal span ONCE with
    * span_len = run + L − 1 (the q229 island discipline; runs are
    * consecutive in pos_a, and pos_a is unique per diagonal, so the
    * window order is total).
    *
    * Orientation: cross-doc pairs carry doc_a < doc_b; within-doc
    * repeats (periodicity included — overlapping occurrences are
    * legitimate spans) carry pos_a < pos_b.
    *
    * Scale (round 12 — the round-11 weak mark closed): the gram
    * stream is the q70/q95 first stage (pre-split array, tokenize
    * once). Two upgrades over the round-11 string-keyed self-join:
    *
    *  - **Shuffle key = ONE BIGINT, never the L-word string.** Each
    *    word char-folds TWICE (the q95 base-31 mod 10⁹+7 fold and the
    *    independent base-37 mod 10⁹+9 fold); each gram folds its L
    *    word hashes base 131 / base 137 under the matching modulus,
    *    and the pair packs bijectively into k1·(10⁹+9) + k2 < 2⁶³.
    *    Joint collision probability is ~10⁻¹⁸ per gram pair (the two
    *    folds differ in base AND modulus at both levels), tolerated
    *    per the winnowing discipline — and the ORACLE replays both
    *    folds (q95's list_reduce machinery), so both engines see the
    *    identical key space. Shuffle rows shrink from ~8 words of
    *    text to 8 bytes.
    *  - **Pair fan-out rides the whale tiling.** Output here IS the
    *    pair set — a gram in n docs genuinely contributes C(n,2)
    *    output rows, so the q102/q137 df-cap CANNOT drop postings
    *    (there is no verification stage to recover them; the honest
    *    form of that discipline for a pair-ENUMERATING operator is
    *    the [[Graph.groupedOrderedPairs]] chunk tiling: ≤ cap² pairs
    *    per task, one rank window per hot gram, no task ever holds a
    *    df-sized group on both sides). One boilerplate gram in 10⁵
    *    docs still emits its ~5·10⁹ true pairs — spread over ~19k
    *    balanced tiles instead of ONE straggler hash bucket. Callers
    *    who only need coverage/clusters at that df should read
    *    q70/q77/q232 instead (SCALE.md). (doc, pos) packs into one
    *    long (doc_id·2²⁴ + pos — q95's 16M-gram doc bound, ANSI-loud
    *    past doc_id 2³⁹) whose natural order IS the pair orientation,
    *    so the tiling's `a < b` emits exactly the oriented pairs.
    *
    * Island windows partition by (doc_a, doc_b, diag) —
    * span-count-sized groups, never corpus-sized. `capped ≡ uncapped`
    * for every cap ≥ 2 (CorpusPrepSpec pins cap ∈ {4, 10⁶} identical
    * on a planted 60-doc boilerplate corpus). */
  def substringDupSpans(docs: DataFrame, minLen: Int,
      cap: Int = Graph.DefaultBasketCap): DataFrame = {
    require(minLen >= 2)
    // persisted: the whale router consumes the gram stream 3× (HLL
    // key census, small-group anti-join, whale semi-join) and the
    // double char fold is the expensive stage — materialize it once,
    // release after the span frame is checkpointed (the Dedup
    // finishAndRelease discipline; 16 bytes/row, never text)
    val grams = gramKeyStream(docs, minLen, Seq("doc_id"))
      .select(col("gk").as("k"),
        // LOUD pos bound: the (doc_id, pos) pack reserves 24 bits for
        // pos; doc_id overflow past 2³⁹ is already ANSI-loud, but a
        // ≥2²⁴-gram document would silently bleed into the doc_id
        // field and corrupt pair identity/orientation — raise instead
        // (the documented q95 16M-gram bound, enforced not assumed).
        (col("doc_id") * 16777216L + expr(
          "if(pos < 16777216, pos, raise_error(" +
            "'substringDupSpans: document with >= 2^24 grams " +
            "overflows the (doc_id, pos) pack'))")).as("it"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = Graph.groupedOrderedPairs(grams, cap)
      .select(expr("a div 16777216").as("doc_a"),
        (col("a") % 16777216L).as("pos_a"),
        expr("b div 16777216").as("doc_b"),
        (col("b") % 16777216L).as("pos_b"))
      .withColumn("diag", col("pos_a") - col("pos_b"))
    val isl = pairs.withColumn("island",
      col("pos_a") - row_number().over(
        Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")))
    val out = isl.groupBy("doc_a", "doc_b", "diag", "island")
      .agg(min(col("pos_a")).as("pos_a"),
        (count(lit(1)) + (minLen - 1)).cast(LongType).as("span_len"))
      .select(col("doc_a"), col("pos_a"), col("doc_b"),
        (col("pos_a") - col("diag")).as("pos_b"), col("span_len"))
      .localCheckpoint() // eager — then the gram cache can release
    grams.unpersist(blocking = false)
    out
  }

  def q245SubstringDedup(spark: SparkSession, dir: String): DataFrame =
    substringDupSpans(load(spark, dir, "documents"), minLen = 8)
      .orderBy("doc_a", "pos_a", "doc_b", "pos_b")

  // ---------------------------------------------------------------- q71

  /** Mixture rebalancing — hit a TARGET mixture (uniform here) with
    * maximum retention: every stratum keeps
    * `rate16 = (16·min_count) div count` sixteenths of its rows via
    * the same deterministic md5-nibble bucket as q46/q68, so the
    * smallest stratum survives whole and larger ones downsample toward
    * it. The data-dependent rates are what separate this from q68's
    * FIXED rates: counts → rates is a tiny aggregate (≤ #strata rows,
    * broadcast back), the row filter stays a pure function of
    * (key, stratum), and the whole plan is one scan + two broadcast
    * joins — nothing driver-side, nothing shuffled but the count agg. */
  def mixtureRebalance(docs: DataFrame, strataCol: String, keyCol: String)
      : DataFrame = {
    val c = docs.groupBy(col(strataCol)).agg(count(lit(1)).as("cnt"))
    val m = c.agg(min(col("cnt")).as("mn"))
    val r = c.crossJoin(broadcast(m))
      .withColumn("rate16", expr("(16 * mn) div cnt"))
      .select(col(strataCol), col("rate16"))
    val pos = conv(Sampling.md5Bucket(col(keyCol)), 16, 10)
      .cast(LongType) + lit(1)
    docs.join(broadcast(r), strataCol).filter(pos <= col("rate16"))
  }

  /** Q71: rebalance the per-source mixture to uniform; emits the
    * derived rate and achieved kept-count per source. */
  def q71Mixture(spark: SparkSession, dir: String): DataFrame =
    mixtureRebalance(load(spark, dir, "documents"), "source", "doc_id")
      .groupBy("source", "rate16")
      .agg(count(lit(1)).as("n_kept"))
      .select(col("source"), col("rate16"), col("n_kept"))
      .orderBy("source")

  // ---------------------------------------------------------------- q78

  /** Corpus report — the per-source "dataset card" numbers every corpus
    * release ships: document count, token volume, mean length, language
    * mix, and exact-duplicate rate, in ONE pass. Exact-dup detection is
    * a count window keyed by the WHOLE-TEXT packed double fold
    * ([[textFoldKey]], round 13): the shuffle carries one 8-byte key
    * instead of the document body, and the DuckDB gate replays both
    * folds — the 100 TB hash-first form is now the gated form (~10⁻¹⁸
    * joint collision per pair). Everything else is conditional
    * aggregation over the same scan. Basis points are exact integer
    * arithmetic (D6); the mean is an exact integer sum divided once in
    * IEEE double (D2 discipline). */
  def corpusReport(docs: DataFrame): DataFrame = {
    graft.functions.SignatureExprs.register(docs.sparkSession)
    val d = docs.withColumn("tcnt",
      count(lit(1)).over(Window.partitionBy(textFoldKey(col("text")))))
      .withColumn("toks", size(split(col("text"), " ")))
    d.groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("toks")).as("tok_sum"),
        (sum(col("n_chars")).cast("double") / count(lit(1)))
          .as("avg_chars"),
        expr("(count_if(lang = 'en') * 10000) div count(1)").as("en_bp"),
        expr("(count_if(tcnt >= 2) * 10000) div count(1)").as("dup_bp"))
  }

  def q78CorpusReport(spark: SparkSession, dir: String): DataFrame =
    corpusReport(load(spark, dir, "documents")).orderBy("source")

  // ------------------------------------------------------- q81/q82/q83

  /** Distinct (source, gram-key) set — shared shingle basis for the
    * cross-source overlap matrix (q81) and per-source novelty (q82).
    * Scale: explode → DISTINCT hash agg; since round 12 the shuffle
    * carries (source, BIGINT gram key) pairs via [[gramKeyStream]]
    * (the engine-shared double fold the oracle replays) — the n-word
    * STRING never leaves the scan stage. */
  private def rawSourceGrams(docs: DataFrame, n: Int): DataFrame =
    gramKeyStream(docs, n, Seq("source"))
      .select(col("source"), col("gk").as("g"))

  private def sourceGrams(docs: DataFrame, n: Int): DataFrame =
    rawSourceGrams(docs, n).distinct()

  /** Q81: cross-source contamination matrix — for every source pair,
    * how many distinct word-3-grams they share. The inter-source
    * overlap report a mixture designer reads before weighting sources
    * (high overlap ⇒ the sources are not independent evidence).
    *
    * Scale: the gram self-join fans out at most (#sources choose 2)
    * rows per gram — bounded by the source count squared, NOT the
    * corpus size — and the final rollup is #source² rows. Hot grams
    * (shared by all sources) are capped the same way. */
  def sourceOverlap(docs: DataFrame, n: Int = 3): DataFrame = {
    val grams = sourceGrams(docs, n)
    grams.as("a").join(grams.as("b"),
        col("a.g") === col("b.g") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy("src_a", "src_b")
  }

  def q81SourceOverlap(spark: SparkSession, dir: String): DataFrame =
    sourceOverlap(load(spark, dir, "documents"))

  /** Q82: per-source novelty — the share of a source's distinct
    * 3-grams that appear in NO other source, in exact basis points.
    * Novelty ~0 means the source adds no new content to the mixture.
    *
    * Scale: ONE full-data shuffle. The raw (source, gram) stream
    * partial-aggregates map-side into per-gram source SETS (bounded by
    * source cardinality, not corpus size), so the g-keyed exchange
    * carries per-partition-distinct pairs; dedup and spread-count both
    * fall out of the one collect_set agg. (A distinct-then-window form
    * would shuffle the full pair set twice: once on (source, g), again
    * on g.) The final per-source rollup is vocabulary-sized. */
  def sourceNovelty(docs: DataFrame, n: Int = 3): DataFrame =
    rawSourceGrams(docs, n)
      .groupBy("g").agg(collect_set(col("source")).as("srcs"))
      .select(explode(col("srcs")).as("source"),
        size(col("srcs")).as("n_src"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_grams"),
        expr("count_if(n_src = 1)").as("n_exclusive"),
        expr("(count_if(n_src = 1) * 10000) div count(1)")
          .as("novelty_bp"))
      .orderBy("source")

  def q82SourceNovelty(spark: SparkSession, dir: String): DataFrame =
    sourceNovelty(load(spark, dir, "documents"))

  /** Q83: document-length histogram — fixed-width token-count buckets
    * (width 32, capped at bucket 15), the length distribution a
    * sequence-packing config (q66's context size) is chosen from.
    * Pure integer bucket arithmetic (identical `div` both engines);
    * one scan + one tiny hash agg. */
  def lengthHistogram(docs: DataFrame, width: Int = 32,
      nBuckets: Int = 16): DataFrame =
    docs.select(size(split(col("text"), " ")).cast("long").as("toks"))
      .withColumn("bucket",
        expr(s"least(toks div ${width}L, ${nBuckets - 1}L)"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("tok_sum"))
      .withColumn("lo", col("bucket") * width)
      .select(col("bucket"), col("lo"), col("n_docs"), col("tok_sum"))
      .orderBy("bucket")

  def q83LengthHistogram(spark: SparkSession, dir: String): DataFrame =
    lengthHistogram(load(spark, dir, "documents"))

  /** Q87: per-source token-length percentiles (p50/p90/p99, SQL
    * percentile_disc semantics) — the tail-length line of the corpus
    * card, and the number a packing context size (q66) is actually
    * chosen against. Rides [[Percentiles.discByRank]]: disk-spilling
    * window sort, boundary-rank selection, so a giant source can never
    * OOM an executor the way a value-buffering percentile would. */
  def q87LenPercentiles(spark: SparkSession, dir: String): DataFrame =
    Percentiles.discByRank(
      load(spark, dir, "documents").select(col("source"),
        size(split(col("text"), " ")).cast("long").as("toks")),
      Seq("source"), "toks",
      Seq(0.5 -> "p50", 0.9 -> "p90", 0.99 -> "p99"), Some("n_docs"))
      .orderBy("source")

  // ---------------------------------------------------------------- q148

  /** Q148: lang × source ASSOCIATION — the contingency-table
    * independence check a corpus audit runs before trusting per-source
    * language mixes: for every (lang, source) cell, the observed
    * count, the integer lift (obs·N·10⁶ div (rowTot·colTot), 10⁶ =
    * independence), and the signed excess obs·N − rowTot·colTot (the
    * χ² numerator's sign — which cells are over/under-represented).
    *
    * Scale: one partial-combining (lang, source) count agg collapses
    * the corpus to the contingency table (|langs|·|sources| rows —
    * fact-independent); margins come from windows over that tiny
    * frame. All-integer (D6); obs·N ≤ N² keeps BIGINT exact to
    * N ≈ 3·10⁹ docs — beyond that the lift moves to DECIMAL
    * internally. */
  def q148LangSourceLift(spark: SparkSession, dir: String): DataFrame = {
    val obs = load(spark, dir, "documents")
      .groupBy("lang", "source").agg(count(lit(1)).as("n"))
    val wL = Window.partitionBy("lang")
    val wS = Window.partitionBy("source")
    val wAll = Window.partitionBy()
    obs
      .withColumn("row_tot", sum(col("n")).over(wL))
      .withColumn("col_tot", sum(col("n")).over(wS))
      .withColumn("tot", sum(col("n")).over(wAll))
      .select(col("lang"), col("source"), col("n"),
        expr("(n * tot * 1000000) div (row_tot * col_tot)")
          .as("lift_ppm"),
        expr("n * tot - row_tot * col_tot").as("excess"))
      .orderBy("lang", "source")
  }

  // ---------------------------------------------------------------- q152

  /** Q152: within-source PERCENTILE-RANK normalization — each
    * document's token length mapped to its exact basis-point percent
    * rank inside its source, pr_bp = (rank−1)·10⁴ div (n−1). The
    * feature-normalization step that makes per-source thresholds
    * comparable (a "long" doc on a tweets source and a "long" doc on
    * a books source land at the same pr_bp); SQL percent_rank in its
    * D6 integer form (no IEEE division in the gate).
    *
    * Ties share a RANK (same length ⇒ same pr_bp — deterministic
    * without a tiebreak); the n = 1 degenerate source maps to 0
    * (guarded: ANSI mode makes the bare n−1 division an error, not a
    * null). Scale: two windows over the same source partitioning (one
    * sort, one unordered count) — spill-sorted, no per-group buffer. */
  def q152RankNormalize(spark: SparkSession, dir: String): DataFrame = {
    val d = load(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("toks"))
    val w = Window.partitionBy("source").orderBy("toks")
    val wn = Window.partitionBy("source")
    d.withColumn("rk", rank().over(w))
      .withColumn("n", count(lit(1)).over(wn))
      .select(col("doc_id"), col("source"), col("toks"),
        expr("CASE WHEN n > 1 THEN" +
          " ((CAST(rk AS BIGINT) - 1) * 10000) div (n - 1)" +
          " ELSE 0L END").as("pr_bp"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- q188

  /** Q188: CHARACTER-CLASS PROFILE — per source, the share of letter /
    * digit / whitespace / other characters in exact bp. The charset
    * sanity audit that catches mojibake, base64-blob and code-heavy
    * sources before tokenization (tx2's word-level quality can't: a
    * doc of hex dumps has fine word lengths). Class counts come from
    * the dialect-safe length-difference idiom — length(text) minus
    * length(regexp_replace(text, class, '')) — never per-char explode.
    *
    * Scale: pure per-row projection + one alphabet-of-sources agg; the
    * regex work is codegen'd and scan-local. */
  def q188CharclassProfile(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")
      .select(col("source"),
        length(col("text")).cast("long").as("nc"),
        (length(col("text")) -
          length(regexp_replace(col("text"), "[A-Za-z]", "")))
          .cast("long").as("nl"),
        (length(col("text")) -
          length(regexp_replace(col("text"), "[0-9]", "")))
          .cast("long").as("nd"),
        (length(col("text")) -
          length(regexp_replace(col("text"), " ", "")))
          .cast("long").as("ns"))
      .groupBy("source")
      .agg(sum(col("nc")).as("n_chars"), sum(col("nl")).as("n_letters"),
        sum(col("nd")).as("n_digits"), sum(col("ns")).as("n_spaces"))
      .select(col("source"), col("n_chars"),
        expr("(n_letters * 10000) div n_chars").as("letters_bp"),
        expr("(n_digits * 10000) div n_chars").as("digits_bp"),
        expr("(n_spaces * 10000) div n_chars").as("spaces_bp"),
        expr("((n_chars - n_letters - n_digits - n_spaces) * 10000)" +
          " div n_chars").as("other_bp"))
      .orderBy("source")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q188_charclass_profile" -> (q188CharclassProfile _),
    "q148_lang_source_lift" -> (q148LangSourceLift _),
    "q152_rank_normalize" -> (q152RankNormalize _),
    "q64_normalize" -> (q64Normalize _),
    "q65_pii_redact" -> (q65PiiRedact _),
    "q66_seq_pack" -> (q66SeqPack _),
    "q67_repetition" -> (q67Repetition _),
    "q68_strat_sample" -> (q68StratSample _),
    "q69_chunk" -> (q69Chunk _),
    "q70_dup_spans" -> (q70DupSpans _),
    "q71_mixture" -> (q71Mixture _),
    "q77_span_removal" -> (q77SpanRemoval _),
    "q245_substring_dedup" -> (q245SubstringDedup _),
    "q78_corpus_report" -> (q78CorpusReport _),
    "q81_source_overlap" -> (q81SourceOverlap _),
    "q82_source_novelty" -> (q82SourceNovelty _),
    "q83_len_hist" -> (q83LengthHistogram _),
    "q87_len_percentiles" -> (q87LenPercentiles _),
    "q257_pack_audit" -> (q257PackAudit _),
    "q258_context_sweep" -> (q258ContextSweep _),
    "q259_pii_audit" -> (q259PiiAudit _),
    "q260_mixture_budget" -> (q260MixtureBudget _),
    "q272_quality_score" -> (q272QualityScore _),
    "q294_surprisal_score" -> (q294SurprisalScore _),
    "q313_importance_sample" -> (q313ImportanceSample _),
    "q279_quality_deciles" -> (q279QualityDeciles _),
  )

  /** DuckDB replay of the [[gramKeyStream]] word-fold arrays — h1/h2
    * off a split-words column named `w` (rendered ONCE; q70/q77/q81/
    * q82/q245 all interpolate these two snippets, so the engine-shared
    * key arithmetic has a single SQL source of truth). */
  private val sqlWordFolds: String =
    """list_transform(w, wd -> list_reduce(
      |      list_prepend(CAST(0 AS BIGINT),
      |        list_transform(range(1, len(wd) + 1),
      |          i -> CAST(ord(substr(wd, i, 1)) AS BIGINT))),
      |      (h, c) -> (h * 31 + c) % 1000000007)) AS h1,
      |    list_transform(w, wd -> list_reduce(
      |      list_prepend(CAST(0 AS BIGINT),
      |        list_transform(range(1, len(wd) + 1),
      |          i -> CAST(ord(substr(wd, i, 1)) AS BIGINT))),
      |      (h, c) -> (h * 37 + c) % 1000000009)) AS h2""".stripMargin

  /** The packed n-gram key off h1/h2 at 1-based position `i`. */
  private def sqlGramKey(n: Int): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT), h1[i:i+${n - 1}]),
       |      (h, c) -> (h * 131 + c) % 1000000007) * 1000000009
       |    + list_reduce(list_prepend(CAST(0 AS BIGINT), h2[i:i+${n - 1}]),
       |      (h, c) -> (h * 137 + c) % 1000000009)""".stripMargin

  /** [[qsWeights]] as a DuckDB BIGINT[] literal — the one rendering
    * of the model table (the Mix.sqlModMults discipline). */
  private def sqlQsWeights: String =
    qsWeights.mkString("[", ", ", "]::BIGINT[]")

  /** The q272 scorer as composable CTEs over a named (doc_id, text)
    * relation — `qm` ends with (doc_id, n_tokens, n_feats, score,
    * mean_e3). q272's own oracle and q273's keeper oracle interpolate
    * this ONE rendering (prefixed q* to stay clash-free inside larger
    * chains). */
  private[operators] def sqlQualityScoreCtes(src: String): String =
    s"""qw0 AS (SELECT doc_id, string_split(text, ' ') AS w
       |        FROM $src),
       |qh AS (SELECT doc_id,
       |    $sqlWordFolds
       |  FROM qw0),
       |qwt AS (SELECT $sqlQsWeights AS wts),
       |qsc AS (
       |  SELECT doc_id, CAST(len(h1) AS BIGINT) AS n_tokens,
       |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |        list_transform(h1, x -> wts[(x % 64) + 1])),
       |        (a, b) -> a + b)
       |      + list_reduce(list_prepend(CAST(0 AS BIGINT),
       |        list_transform(range(1, len(h1)),
       |          i -> wts[(((h1[i] * 131 + h1[i+1]) % 1000000007)
       |            % 64) + 1])),
       |        (a, b) -> a + b) AS BIGINT) AS score
       |  FROM qh CROSS JOIN qwt),
       |qm AS (
       |  SELECT doc_id, n_tokens,
       |    n_tokens + greatest(n_tokens - 1, 0) AS n_feats, score,
       |    (score * 1000) //
       |      greatest(n_tokens + greatest(n_tokens - 1, 0), 1)
       |      AS mean_e3
       |  FROM qsc)""".stripMargin

  /** The q294 surprisal scorer as composable CTEs over a named
    * (doc_id, text) relation — `sm` ends with (doc_id, n_bigrams,
    * surp_mean) for EVERY doc of the source (left join; no-bigram docs
    * score 0). q294's own oracle and the pipeline-v3 oracle
    * interpolate this ONE rendering (s*-prefixed, clash-free next to
    * the q272 q*-CTEs and pipelineTailSql). */
  private[operators] def sqlSurprisalCtes(src: String): String =
    s"""sw0 AS (SELECT doc_id, string_split(text, ' ') AS w
       |        FROM $src),
       |sbg AS (
       |  SELECT doc_id, w[CAST(i AS INTEGER)] AS wa,
       |    w[CAST(i AS INTEGER) + 1] AS wb
       |  FROM (SELECT doc_id, w,
       |          unnest(generate_series(1, len(w) - 1)) AS i
       |        FROM sw0 WHERE len(w) >= 2)),
       |sun AS (SELECT wa, CAST(COUNT(*) AS BIGINT) AS na FROM (
       |          SELECT unnest(w) AS wa FROM sw0) GROUP BY wa),
       |sbc AS (SELECT wa, wb, CAST(COUNT(*) AS BIGINT) AS nab
       |        FROM sbg GROUP BY wa, wb),
       |ssc AS (
       |  SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       |    CAST(SUM((u.na * 1000000) // c.nab) AS BIGINT) AS surp_sum
       |  FROM sbg b JOIN sbc c USING (wa, wb) JOIN sun u USING (wa)
       |  GROUP BY b.doc_id),
       |sm AS (
       |  SELECT d.doc_id,
       |    CAST(COALESCE(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       |    CAST(COALESCE(s.surp_sum // s.n_bigrams, 0) AS BIGINT)
       |      AS surp_mean
       |  FROM $src d LEFT JOIN ssc s USING (doc_id))""".stripMargin

  /** The q313 DSIR importance scorer as composable CTEs over a named
    * (doc_id, text) relation and a target-id subquery — `ik` ends with
    * (doc_id, n_feats, w_e6, kept) for EVERY doc of the source.
    * q313's own oracle and the pipeline-v4 oracle interpolate this ONE
    * rendering (i*-prefixed, clash-free next to the q272 q*-CTEs, the
    * q294 s*-CTEs and pipelineTailSql). The feature fold is the
    * [[sqlWordFolds]] h1 chain; buckets, ratio/lift div chain and the
    * five-nibble md5 keep rule replay the Spark ops 1:1. */
  private[operators] def sqlImportanceCtes(src: String,
      targetIds: String): String =
    s"""iw0 AS (SELECT doc_id, string_split(text, ' ') AS w
       |        FROM $src),
       |ih AS (SELECT doc_id,
       |    $sqlWordFolds
       |  FROM iw0),
       |ib AS (
       |  SELECT doc_id, unnest(list_concat(
       |    list_transform(h1, x -> x % 64),
       |    list_transform(range(1, len(h1)),
       |      i -> ((h1[i] * 131 + h1[i+1]) % 1000000007) % 64))) AS b
       |  FROM ih),
       |itg AS ($targetIds),
       |ica AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c_all
       |        FROM ib GROUP BY b),
       |ict AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c_tgt
       |        FROM ib JOIN itg USING (doc_id) GROUP BY b),
       |itot AS (
       |  SELECT (SELECT CAST(SUM(c_all) AS BIGINT) FROM ica) AS n_all,
       |         (SELECT CAST(SUM(c_tgt) AS BIGINT) FROM ict) AS n_tgt),
       |ilf AS (
       |  SELECT a.b,
       |    (((COALESCE(t.c_tgt, 0) * 1000000) // a.c_all) * n_all)
       |      // n_tgt AS lift_e6
       |  FROM ica a LEFT JOIN ict t USING (b) CROSS JOIN itot),
       |idw AS (
       |  SELECT x.doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
       |    CAST(SUM(l.lift_e6) AS BIGINT) AS lsum
       |  FROM ib x JOIN ilf l USING (b) GROUP BY x.doc_id),
       |imw AS (
       |  SELECT d.doc_id,
       |    CAST(COALESCE(w.n_feats, 0) AS BIGINT) AS n_feats,
       |    CAST(COALESCE(w.lsum // w.n_feats, 0) AS BIGINT) AS w_e6
       |  FROM $src d LEFT JOIN idw w USING (doc_id)),
       |imx AS (SELECT CAST(MAX(w_e6) AS BIGINT) AS mxw FROM imw),
       |ik AS (
       |  SELECT doc_id, n_feats, w_e6,
       |    CAST(CASE WHEN (
       |        (strpos('0123456789abcdef',
       |           substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 65536
       |      + (strpos('0123456789abcdef',
       |           substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 4096
       |      + (strpos('0123456789abcdef',
       |           substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 256
       |      + (strpos('0123456789abcdef',
       |           substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) * 16
       |      + (strpos('0123456789abcdef',
       |           substr(md5(CAST(doc_id AS VARCHAR)), 5, 1)) - 1)
       |      ) * mxw < w_e6 * 1048576 THEN 1 ELSE 0 END AS BIGINT)
       |      AS kept
       |  FROM imw CROSS JOIN imx)""".stripMargin

  val oracle: Map[String, String] = Map(
    // q313: the shared importance CTEs over documents with the
    // English-slice target — same folds, same bounded div chain,
    // same five-nibble md5 resampling rule.
    "q313_importance_sample" ->
      (s"WITH ${sqlImportanceCtes("documents",
        "SELECT doc_id FROM documents WHERE lang = 'en'")}" +
        """
        |SELECT doc_id, n_feats, w_e6, kept
        |FROM ik ORDER BY doc_id""".stripMargin),
    // q294: the shared surprisal CTEs over documents + the literal
    // threshold keep flag (surpKeepE6 — one rendering).
    "q294_surprisal_score" ->
      (s"WITH ${sqlSurprisalCtes("documents")}" +
        s"""
        |SELECT doc_id, n_bigrams, surp_mean,
        |  CAST(CASE WHEN surp_mean < $surpKeepE6
        |    THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM sm ORDER BY doc_id""".stripMargin),
    // q272: same word folds (sqlWordFolds — one renderer), same
    // mod-64 buckets, same literal weight table, same left-fold sums
    // (all-integer, order-free), same div/keep finale.
    "q272_quality_score" ->
      (s"WITH ${sqlQualityScoreCtes("documents")}" +
        """
        |SELECT doc_id, n_tokens, n_feats, score, mean_e3,
        |  CAST(CASE WHEN mean_e3 >= 0
        |    THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM qm ORDER BY doc_id""".stripMargin),
    // q279: the shared q272 score CTEs + the q87 quantile_disc pairing
    // (rank selection ≡ DuckDB's discrete-quantile boundary, the
    // round-4 pin).
    "q279_quality_deciles" ->
      (s"WITH ${sqlQualityScoreCtes("documents")}" + """,
        |jsrc AS (
        |  SELECT d.source, qm.mean_e3
        |  FROM qm JOIN documents d USING (doc_id))
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(quantile_disc(mean_e3, 0.1) AS BIGINT) AS p10,
        |  CAST(quantile_disc(mean_e3, 0.5) AS BIGINT) AS p50,
        |  CAST(quantile_disc(mean_e3, 0.9) AS BIGINT) AS p90
        |FROM jsrc GROUP BY source ORDER BY source""".stripMargin),
    // q188: same length-difference class counts (DuckDB needs the 'g'
    // flag — its regexp_replace is first-match by default, Spark's is
    // global), same bp divisions.
    "q188_charclass_profile" ->
      """WITH d AS (
        |  SELECT source,
        |    CAST(length(text) AS BIGINT) AS nc,
        |    CAST(length(text) -
        |      length(regexp_replace(text, '[A-Za-z]', '', 'g'))
        |      AS BIGINT) AS nl,
        |    CAST(length(text) -
        |      length(regexp_replace(text, '[0-9]', '', 'g'))
        |      AS BIGINT) AS nd,
        |    CAST(length(text) - length(replace(text, ' ', ''))
        |      AS BIGINT) AS ns
        |  FROM documents),
        |s AS (
        |  SELECT source, CAST(SUM(nc) AS BIGINT) AS n_chars,
        |    CAST(SUM(nl) AS BIGINT) AS n_letters,
        |    CAST(SUM(nd) AS BIGINT) AS n_digits,
        |    CAST(SUM(ns) AS BIGINT) AS n_spaces
        |  FROM d GROUP BY source)
        |SELECT source, n_chars,
        |  (n_letters * 10000) // n_chars AS letters_bp,
        |  (n_digits * 10000) // n_chars AS digits_bp,
        |  (n_spaces * 10000) // n_chars AS spaces_bp,
        |  ((n_chars - n_letters - n_digits - n_spaces) * 10000)
        |    // n_chars AS other_bp
        |FROM s ORDER BY source""".stripMargin,
    // q152: RANK ties ≡ Spark rank; integer pr formula both sides;
    // len(string_split) counts empties exactly like size(split).
    "q152_rank_normalize" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, source, toks,
        |    RANK() OVER (PARTITION BY source ORDER BY toks) AS rk,
        |    COUNT(*) OVER (PARTITION BY source) AS n
        |  FROM d)
        |SELECT doc_id, source, toks,
        |  CASE WHEN n > 1
        |       THEN ((CAST(rk AS BIGINT) - 1) * 10000) // (n - 1)
        |       ELSE CAST(0 AS BIGINT) END AS pr_bp
        |FROM r ORDER BY doc_id""".stripMargin,
    // q148: margins as window sums over the same contingency frame;
    // integer lift and signed excess on both sides.
    "q148_lang_source_lift" ->
      """WITH obs AS (
        |  SELECT lang, source, COUNT(*) AS n
        |  FROM documents GROUP BY lang, source),
        |m AS (
        |  SELECT lang, source, n,
        |    CAST(SUM(n) OVER (PARTITION BY lang) AS BIGINT) AS row_tot,
        |    CAST(SUM(n) OVER (PARTITION BY source) AS BIGINT) AS col_tot,
        |    CAST(SUM(n) OVER () AS BIGINT) AS tot
        |  FROM obs)
        |SELECT lang, source, n,
        |  (n * tot * 1000000) // (row_tot * col_tot) AS lift_ppm,
        |  n * tot - row_tot * col_tot AS excess
        |FROM m ORDER BY lang, source""".stripMargin,
    // q64: same messy-blob construction, same normalization chain.
    // DuckDB regexp_replace needs the 'g' flag (Spark replaces all
    // matches by default).
    "q64_normalize" ->
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(
        |    lower('  ' || upper(text) || ' !! ' || text || '  '),
        |    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm,
        |  CAST(length(trim(regexp_replace(regexp_replace(
        |    lower('  ' || upper(text) || ' !! ' || text || '  '),
        |    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS BIGINT) AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    // q65: identical blob, identical three-stage redaction (email,
    // ssn, phone — same order), identical detector counts.
    "q65_pii_redact" ->
      """WITH blobs AS (
        |  SELECT c_custkey AS id,
        |    'contact ' || c_name || ' at user' ||
        |    CAST(c_custkey AS VARCHAR) || '@example.com or +1-555-' ||
        |    lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') ||
        |    ' ssn 123-45-6789' AS blob
        |  FROM customer)
        |SELECT id,
        |  regexp_replace(regexp_replace(regexp_replace(blob,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '[EMAIL]', 'g'),
        |    '[0-9]{3}-[0-9]{2}-[0-9]{4}', '[SSN]', 'g'),
        |    '\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g') AS redacted,
        |  CAST(len(regexp_extract_all(blob,
        |      '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) +
        |    len(regexp_extract_all(blob, '[0-9]{3}-[0-9]{2}-[0-9]{4}')) +
        |    len(regexp_extract_all(blob, '\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}'))
        |    AS BIGINT) AS pii_found
        |FROM blobs ORDER BY id""".stripMargin,
    // q257: the q66 placement replayed, then (first chunk ≠ last
    // chunk) = a boundary-straddling doc; window SUM is HUGEINT in
    // DuckDB → CAST.
    "q257_pack_audit" ->
      """WITH toks AS (
        |  SELECT source, doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
        |  FROM documents),
        |placed AS (
        |  SELECT source, tokens,
        |    CAST(SUM(tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - tokens AS BIGINT) AS start
        |  FROM toks),
        |a AS (
        |  SELECT source, tokens, start // 512 AS chunk,
        |    (start + tokens - 1) // 512 AS lastc
        |  FROM placed),
        |g AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    CAST(SUM(tokens) AS BIGINT) AS tok_sum,
        |    CAST(SUM(CASE WHEN lastc <> chunk THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_split,
        |    MAX(lastc) + 1 AS n_chunks
        |  FROM a GROUP BY source)
        |SELECT source, n_docs, tok_sum, n_split,
        |  (n_split * 1000000) // n_docs AS split_ppm, n_chunks,
        |  (tok_sum * 1000000) // (n_chunks * 512) AS fill_ppm
        |FROM g ORDER BY source""".stripMargin,
    // q258: same 4-config fan-out (unnest of a literal list), same
    // integer truncation/padding arithmetic.
    "q258_context_sweep" ->
      """WITH d AS (
        |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
        |  FROM documents),
        |e AS (
        |  SELECT toks, CAST(ctx AS BIGINT) AS ctx FROM d,
        |    unnest([128, 256, 512, 1024]) AS t(ctx)),
        |g AS (
        |  SELECT ctx, COUNT(*) AS n_docs,
        |    CAST(SUM(CASE WHEN toks > ctx THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_truncated,
        |    CAST(SUM(greatest(toks - ctx, 0)) AS BIGINT) AS tokens_lost,
        |    CAST(SUM(greatest(ctx - toks, 0)) AS BIGINT) AS pad_waste,
        |    CAST(SUM(least(toks, ctx)) AS BIGINT) AS kept
        |  FROM e GROUP BY ctx)
        |SELECT ctx, n_docs, n_truncated,
        |  (n_truncated * 1000000) // n_docs AS truncated_ppm,
        |  tokens_lost, pad_waste,
        |  (kept * 1000000) // (n_docs * ctx) AS utilization_ppm
        |FROM g ORDER BY ctx""".stripMargin,
    // q259: identical data-dependent blob construction (mod gates),
    // the q65 regex dialect (regexp_extract_all counts = Spark
    // regexp_count), any-PII rate in bp.
    "q259_pii_audit" ->
      """WITH b AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nation,
        |    'row ' || c_name ||
        |    CASE WHEN c_custkey % 3 = 0 THEN ' user' ||
        |      CAST(c_custkey AS VARCHAR) || '@example.com'
        |      ELSE '' END ||
        |    CASE WHEN c_custkey % 5 = 0 THEN ' +1-555-' ||
        |      lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
        |      ELSE '' END ||
        |    CASE WHEN c_custkey % 7 = 0 THEN ' ssn 123-45-6789'
        |      ELSE '' END AS blob
        |  FROM customer),
        |c AS (
        |  SELECT nation,
        |    CAST(len(regexp_extract_all(blob,
        |      '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}'))
        |      AS BIGINT) AS em,
        |    CAST(len(regexp_extract_all(blob,
        |      '\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS ph,
        |    CAST(len(regexp_extract_all(blob,
        |      '[0-9]{3}-[0-9]{2}-[0-9]{4}')) AS BIGINT) AS ss
        |  FROM b),
        |g AS (
        |  SELECT nation, COUNT(*) AS n_rows,
        |    CAST(SUM(em) AS BIGINT) AS email_hits,
        |    CAST(SUM(ph) AS BIGINT) AS phone_hits,
        |    CAST(SUM(ss) AS BIGINT) AS ssn_hits,
        |    CAST(SUM(CASE WHEN em + ph + ss > 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_any
        |  FROM c GROUP BY nation)
        |SELECT nation, n_rows, email_hits, phone_hits, ssn_hits,
        |  (n_any * 10000) // n_rows AS any_pii_bp
        |FROM g ORDER BY nation""".stripMargin,
    // q260: same per-source TTR quality, same 40% budget, same greedy
    // cumsum clamp; window SUM cast (HUGEINT), ties impossible
    // (source is unique in the order).
    "q260_mixture_budget" ->
      """WITH per AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS toks,
        |    CAST(COUNT(DISTINCT w) AS BIGINT) AS dw
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
        |        FROM documents) t
        |  GROUP BY source),
        |q AS (
        |  SELECT source, (dw * 1000000) // toks AS quality_ppm, toks
        |  FROM per),
        |b AS (
        |  SELECT (CAST(SUM(toks) AS BIGINT) * 2) // 5 AS budget
        |  FROM per),
        |c AS (
        |  SELECT source, quality_ppm, toks,
        |    CAST(SUM(toks) OVER (ORDER BY quality_ppm DESC, source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum_tokens
        |  FROM q)
        |SELECT source, quality_ppm, toks, cum_tokens,
        |  greatest(0, least(toks, budget - (cum_tokens - toks)))
        |    AS alloc,
        |  (greatest(0, least(toks, budget - (cum_tokens - toks)))
        |    * 10000) // toks AS taken_bp
        |FROM c CROSS JOIN b
        |ORDER BY quality_ppm DESC, source""".stripMargin,
    // q66: running token sum per source in doc_id order; a doc's chunk
    // is where its first token lands. `//` = Spark's `div`.
    "q66_seq_pack" ->
      """WITH toks AS (
        |  SELECT source, doc_id,
        |    len(string_split(text, ' ')) AS tokens
        |  FROM documents),
        |placed AS (
        |  SELECT source, doc_id, tokens,
        |    CAST(SUM(tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - tokens AS BIGINT) AS start
        |  FROM toks)
        |SELECT source, start // 512 AS chunk,
        |  COUNT(*) AS n_docs, CAST(SUM(tokens) AS BIGINT) AS tok_sum,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM placed GROUP BY source, start // 512
        |ORDER BY source, chunk""".stripMargin,
    // q67: list_distinct mirrors array_distinct; bigram construction
    // mirrors q56's oracle form; integer-div basis points (D6).
    "q67_repetition" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    len(string_split(text, ' ')) AS n_words,
        |    len(list_distinct(string_split(text, ' '))) AS d_words,
        |    list_transform(range(1, len(string_split(text, ' '))),
        |      i -> string_split(text, ' ')[i] || ' ' ||
        |           string_split(text, ' ')[i+1]) AS bg
        |  FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2)
        |SELECT doc_id, n_words, d_words,
        |  len(bg) AS n_bigrams, len(list_distinct(bg)) AS d_bigrams,
        |  ((n_words - d_words) * 10000) // n_words AS dup_word_bp,
        |  ((len(bg) - len(list_distinct(bg))) * 10000) // len(bg)
        |    AS dup_bigram_bp,
        |  CAST(CASE WHEN ((len(bg) - len(list_distinct(bg))) * 10000)
        |    // len(bg) < 2000 THEN 1 ELSE 0 END AS BIGINT) AS kept
        |FROM m ORDER BY doc_id""".stripMargin,
    // q68: same md5 nibble, same per-lang sixteenths. strpos(hay,
    // needle) == Spark locate(needle, hay), both 1-based.
    "q68_strat_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE strpos('0123456789abcdef',
        |    substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)) <=
        |  CASE lang WHEN 'en' THEN 8 WHEN 'de' THEN 4 WHEN 'fr' THEN 4
        |            WHEN 'es' THEN 2 WHEN 'zh' THEN 1 ELSE 0 END
        |ORDER BY doc_id""".stripMargin,
    // q69: same starts (0, 150, 300, … < n_chars — DuckDB range() is
    // stop-exclusive, Spark sequence(0, n_chars-1) is inclusive: same
    // set), same 200-char take, same integer-div chunk index.
    "q69_chunk" ->
      """WITH s AS (
        |  SELECT doc_id, text,
        |    unnest(range(0, n_chars, 150)) AS start
        |  FROM documents)
        |SELECT doc_id, start // 150 AS chunk_idx,
        |  substr(text, CAST(start AS INT) + 1, 200) AS chunk,
        |  CAST(length(substr(text, CAST(start AS INT) + 1, 200))
        |    AS BIGINT) AS chunk_len
        |FROM s ORDER BY doc_id, chunk_idx""".stripMargin,
    // q245: same 1-based 8-gram positions, same pair orientation
    // (doc_a < doc_b, or same-doc pos_a < pos_b), same diagonal
    // gaps-and-islands maximal-span recovery; pos_a is unique per
    // (doc_a, doc_b, diag) so the island window order is total (D1).
    // ROUND 12: the join key is the ENGINE-SHARED double polynomial
    // fold, replayed here exactly as the q95/tx4 machinery — per-word
    // char folds (base 31 mod 10⁹+7 AND base 37 mod 10⁹+9, code
    // points via ord), 8-word gram folds base 131/137 under the
    // matching modulus, packed k1·(10⁹+9)+k2 — so both engines see
    // the identical key space (collisions, were any reachable at
    // ~10⁻¹⁸, would be shared). All-BIGINT output.
    "q245_substring_dedup" ->
      s"""WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 8),
        |wh AS (
        |  SELECT doc_id,
        |    $sqlWordFolds
        |  FROM t),
        |g AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |    ${sqlGramKey(8)} AS k
        |  FROM (SELECT doc_id, h1, h2,
        |          unnest(generate_series(1, len(h1) - 7)) AS i
        |        FROM wh) t1),
        |p AS (
        |  SELECT a.doc_id AS doc_a, a.pos AS pos_a,
        |    b.doc_id AS doc_b, b.pos AS pos_b,
        |    a.pos - b.pos AS diag
        |  FROM g a JOIN g b ON a.k = b.k
        |  WHERE a.doc_id < b.doc_id
        |     OR (a.doc_id = b.doc_id AND a.pos < b.pos)),
        |i AS (
        |  SELECT doc_a, doc_b, diag, pos_a,
        |    pos_a - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, diag
        |      ORDER BY pos_a) AS island
        |  FROM p),
        |s AS (
        |  SELECT doc_a, doc_b, diag, MIN(pos_a) AS pos_a,
        |    CAST(COUNT(*) + 7 AS BIGINT) AS span_len
        |  FROM i GROUP BY doc_a, doc_b, diag, island)
        |SELECT doc_a, pos_a, doc_b, pos_a - diag AS pos_b, span_len
        |FROM s ORDER BY doc_a, pos_a, doc_b, pos_b""".stripMargin,
    // q70: identical 5-gram positions (generate_series inclusive ↔
    // sequence inclusive), gram identity = the ROUND-12 packed double
    // fold (q245's engine-shared key, replayed via the shared
    // snippets), global occurrence counts, per-doc dup coverage in
    // integer basis points. SUM(CASE) is HUGEINT in DuckDB → CAST.
    "q70_dup_spans" ->
      s"""WITH w0 AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 5),
        |wh AS (
        |  SELECT doc_id,
        |    $sqlWordFolds
        |  FROM w0),
        |g AS (
        |  SELECT doc_id, ${sqlGramKey(5)} AS gk
        |  FROM (SELECT doc_id, h1, h2,
        |          unnest(generate_series(1, len(h1) - 4)) AS i
        |        FROM wh) t1),
        |c AS (SELECT gk, COUNT(*) AS cnt FROM g GROUP BY gk)
        |SELECT g.doc_id, COUNT(*) AS n_grams,
        |  CAST(SUM(CASE WHEN c.cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS dup_grams,
        |  (CAST(SUM(CASE WHEN c.cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    * 10000) // COUNT(*) AS dup_bp
        |FROM g JOIN c USING (gk)
        |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin,
    // q77: same 0-based positions/grams, same ≥2 global-count rule,
    // same k-wide coverage expansion, same in-order reassembly
    // (string_agg ORDER BY ↔ array_sort of (idx, word) structs).
    "q77_span_removal" ->
      s"""WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |words AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(ws) + 1),
        |    i -> struct_pack(idx := i - 1, word := ws[i]))) AS s
        |  FROM w),
        |words2 AS (SELECT doc_id, s.idx AS idx, s.word AS word FROM words),
        |wh AS (
        |  SELECT doc_id,
        |    $sqlWordFolds
        |  FROM (SELECT doc_id, ws AS w FROM w WHERE len(ws) >= 5) t0),
        |grams2 AS (
        |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS p0,
        |    ${sqlGramKey(5)} AS gk
        |  FROM (SELECT doc_id, h1, h2,
        |          unnest(generate_series(1, len(h1) - 4)) AS i
        |        FROM wh) t1),
        |c AS (SELECT gk, COUNT(*) AS cnt FROM grams2 GROUP BY gk),
        |cov AS (
        |  SELECT DISTINCT grams2.doc_id, grams2.p0 + t.o AS idx
        |  FROM grams2 JOIN c USING (gk), unnest(range(0, 5)) AS t(o)
        |  WHERE c.cnt >= 2),
        |kept AS (
        |  SELECT w2.doc_id, w2.idx, w2.word FROM words2 w2
        |  LEFT JOIN cov ON w2.doc_id = cov.doc_id AND w2.idx = cov.idx
        |  WHERE cov.doc_id IS NULL),
        |agg AS (
        |  SELECT doc_id, string_agg(word, ' ' ORDER BY idx) AS clean_text,
        |    COUNT(*) AS n_kept
        |  FROM kept GROUP BY doc_id)
        |SELECT w.doc_id,
        |  coalesce(agg.clean_text, '') AS clean_text,
        |  coalesce(agg.n_kept, 0) AS n_kept,
        |  CAST(len(w.ws) AS BIGINT) - coalesce(agg.n_kept, 0) AS n_removed
        |FROM w LEFT JOIN agg USING (doc_id)
        |ORDER BY w.doc_id""".stripMargin,
    // q78: COUNT FILTER ↔ count_if; SUM(int) is HUGEINT in DuckDB →
    // CAST; the mean divides an exact integer sum once in double. The
    // dup window partitions by the WHOLE-TEXT double fold (round 13) —
    // the oracle replays the engine's 8-byte key, not text equality.
    "q78_corpus_report" ->
      s"""WITH d AS (
        |  SELECT source, lang, n_chars,
        |    len(string_split(text, ' ')) AS toks,
        |    COUNT(*) OVER (PARTITION BY ${sqlTextFold("text")}) AS tcnt
        |  FROM documents)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(toks) AS BIGINT) AS tok_sum,
        |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
        |  (CAST(COUNT(*) FILTER (WHERE lang = 'en') AS BIGINT) * 10000)
        |    // COUNT(*) AS en_bp,
        |  (CAST(COUNT(*) FILTER (WHERE tcnt >= 2) AS BIGINT) * 10000)
        |    // COUNT(*) AS dup_bp
        |FROM d GROUP BY source ORDER BY source""".stripMargin,
    // q81/q82: 3-gram identity = the ROUND-12 packed double fold
    // (shared snippets — the n-word string never acts as a key on
    // either engine); generate_series is inclusive like sequence, so
    // short docs vanish identically under the len ≥ 3 guard.
    "q81_source_overlap" ->
      s"""WITH w0 AS (SELECT source, string_split(text, ' ') AS w
        |           FROM documents
        |           WHERE len(string_split(text, ' ')) >= 3),
        |wh AS (SELECT source,
        |    $sqlWordFolds
        |  FROM w0),
        |g AS (SELECT DISTINCT source, g FROM (
        |        SELECT source, ${sqlGramKey(3)} AS g
        |        FROM (SELECT source, h1, h2,
        |                unnest(generate_series(1, len(h1) - 2)) AS i
        |              FROM wh) t1))
        |SELECT a.source AS src_a, b.source AS src_b,
        |  COUNT(*) AS n_shared
        |FROM g a JOIN g b ON a.g = b.g AND a.source < b.source
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q82_source_novelty" ->
      s"""WITH w0 AS (SELECT source, string_split(text, ' ') AS w
        |           FROM documents
        |           WHERE len(string_split(text, ' ')) >= 3),
        |wh AS (SELECT source,
        |    $sqlWordFolds
        |  FROM w0),
        |g AS (SELECT DISTINCT source, g FROM (
        |        SELECT source, ${sqlGramKey(3)} AS g
        |        FROM (SELECT source, h1, h2,
        |                unnest(generate_series(1, len(h1) - 2)) AS i
        |              FROM wh) t1)),
        |sp AS (SELECT source, g,
        |         COUNT(*) OVER (PARTITION BY g) AS n_src FROM g)
        |SELECT source, COUNT(*) AS n_grams,
        |  COUNT(*) FILTER (WHERE n_src = 1) AS n_exclusive,
        |  (COUNT(*) FILTER (WHERE n_src = 1) * 10000) // COUNT(*)
        |    AS novelty_bp
        |FROM sp GROUP BY source ORDER BY source""".stripMargin,
    // q87: quantile_disc is the pinned percentile_disc definition
    // (q61's boundary-definition unit test); toks is BIGINT both sides.
    "q87_len_percentiles" ->
      """SELECT source, COUNT(*) AS n_docs,
        |  CAST(quantile_disc(toks, 0.5) AS BIGINT) AS p50,
        |  CAST(quantile_disc(toks, 0.9) AS BIGINT) AS p90,
        |  CAST(quantile_disc(toks, 0.99) AS BIGINT) AS p99
        |FROM (SELECT source, len(string_split(text, ' ')) AS toks
        |      FROM documents)
        |GROUP BY source ORDER BY source""".stripMargin,
    // q83: same integer bucket arithmetic both engines; SUM(BIGINT) is
    // HUGEINT in DuckDB → CAST.
    "q83_len_hist" ->
      """WITH d AS (
        |  SELECT len(string_split(text, ' ')) AS toks FROM documents)
        |SELECT least(toks // 32, 15) AS bucket,
        |  least(toks // 32, 15) * 32 AS lo,
        |  COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS tok_sum
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    // q71: same derived sixteenth-rates ((16·min) // cnt), same md5
    // nibble bucket as q46/q68.
    "q71_mixture" ->
      """WITH c AS (
        |  SELECT source, COUNT(*) AS cnt FROM documents GROUP BY source),
        |m AS (SELECT MIN(cnt) AS mn FROM c),
        |r AS (SELECT source, CAST((16 * mn) // cnt AS BIGINT) AS rate16
        |      FROM c, m)
        |SELECT d.source, r.rate16, COUNT(*) AS n_kept
        |FROM documents d JOIN r ON d.source = r.source
        |WHERE strpos('0123456789abcdef',
        |    substr(md5(CAST(d.doc_id AS VARCHAR)), 32, 1)) <= r.rate16
        |GROUP BY d.source, r.rate16 ORDER BY d.source""".stripMargin,
  )
}
