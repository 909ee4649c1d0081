package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables.load

/** Text-analysis + exact-dedup surface — SURVEY.md §2-B Q31/Q32 and the
  * north-star training-data-pipeline text operators: token counting,
  * quality scoring, language-ID, document fingerprinting.
  *
  * Scale notes: everything is per-document map work + a hash aggregate —
  * embarrassingly parallel, no driver collects, codegen-friendly built-in
  * expressions only (split/explode/regexp/hash).
  */
object TextOps {

  /** Q31a language stats. */
  def q31Lang(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")
      .groupBy("lang")
      .agg(count(lit(1)).as("docs"), sum(col("n_chars")).as("chars"))
      .orderBy("lang")

  /** Q31b tokenize + word count (top-20, count-desc with word tiebreak). */
  def q31Tokens(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w")
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(20)

  /** Q32 exact-dedup stats per source (hash-groupBy distinct). */
  def q32DedupExact(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")
      .groupBy("source")
      .agg(count(lit(1)).as("n"), countDistinct(col("text")).as("uniq"))
      .orderBy("source")

  /** Exact dedup as an operator (north star): keep one row per text.
    * dropDuplicates is a shuffle-parallel hash-groupBy; at 100 TB dedupe
    * on a 64-bit content hash first so the shuffle moves hashes, not
    * document bodies. This query returns the survivor count + rows so the
    * oracle can check it exactly. */
  def q32bDedupRows(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")
      .select(col("text"))
      .distinct()
      .agg(count(lit(1)).as("uniq_texts"))

  /** Token counting (north star): whitespace tokens + a BPE-ish regex
    * token count (alphanumeric runs as word pieces). regexp_count keeps
    * the semantics identical across engines (no split-edge-case drift). */
  def tx1TokenCount(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast(LongType).as("ws_tokens"),
        regexp_count(col("text"), lit("[a-zA-Z0-9]+")).cast(LongType)
          .as("re_tokens"))
      .orderBy("doc_id")

  /** Quality scoring (north star): length, word count, mean word length
    * (×100), stopword count + ratio (basis points) — the classic cheap
    * quality filters for pretraining data, all as one codegen'd
    * projection. Ratios use exact integer DIV so the oracle comparison is
    * representation-independent. */
  def tx2Quality(spark: SparkSession, dir: String): DataFrame = {
    val nChars = length(col("text")).cast(LongType)
    val nWords = size(split(col("text"), " ")).cast(LongType)
    val stopRe = "\\b(the|a|an|of|to|and|in|is|it)\\b"
    val nStops = regexp_count(col("text"), lit(stopRe)).cast(LongType)
    load(spark, dir, "documents")
      .select(col("doc_id"),
        nChars.as("chars"),
        nWords.as("words"),
        try_divide(nChars * 100, nWords).cast(LongType).as("mean_wlen_c"),
        nStops.as("stops"),
        try_divide(nStops * 10000, nWords).cast(LongType).as("stop_bp"))
      .orderBy("doc_id")
  }

  /** Language-ID heuristic (north star, implementation-only): score each
    * doc against tiny per-language stopword sets via regex counts and
    * argmax. Deterministic; accuracy asserted in TextOpsSpec against the
    * fixture's lang column. */
  def langIdScores(documents: DataFrame): DataFrame = {
    val markers: Seq[(String, String)] = Seq(
      "en" -> "(?i)\\b(the|and|of|to|is|in|that|with)\\b",
      "de" -> "(?i)\\b(der|die|das|und|ist|nicht|mit|ein)\\b",
      "fr" -> "(?i)\\b(le|la|les|et|est|une|dans|pour)\\b",
      "es" -> "(?i)\\b(el|los|las|y|es|una|para|como)\\b")
    val scored = markers.foldLeft(documents) { case (df, (lang, re)) =>
      df.withColumn(s"score_$lang", size(split(col("text"), re)) - 1)
    }
    val best = markers.map { case (lang, _) =>
      struct(col(s"score_$lang").as("s"), lit(lang).as("l"))
    }
    scored.withColumn("pred_lang",
      greatest(best: _*).getField("l"))
  }

  /** Document fingerprint (north star, implementation-only): 64-bit
    * content hash + a shift-rolling hash over word tokens — stable input
    * to large-scale exact/near dedup. */
  def fingerprint(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
      xxhash64(col("text")).as("content_hash"),
      // rotate-left-5 ⊕ token-hash: overflow-free under ANSI mode (shifts
      // and xor never overflow, unlike the classic *31+h polynomial).
      aggregate(split(col("text"), " "), lit(0L), (acc, w) =>
        (shiftleft(acc, 5).bitwiseOR(shiftrightunsigned(acc, 59)))
          .bitwiseXOR(xxhash64(w))).as("rolling_hash"))

  def tx3LangId(spark: SparkSession, dir: String): DataFrame =
    langIdScores(load(spark, dir, "documents"))
      .select(col("doc_id"), col("lang"), col("pred_lang"))
      .orderBy("doc_id")

  def tx4Fingerprint(spark: SparkSession, dir: String): DataFrame =
    fingerprint(load(spark, dir, "documents")).orderBy("doc_id")

  /** Q56: corpus-level top-k n-gram frequency — the "what is in my
    * corpus" scan every training pipeline runs. Term-frequency bigrams
    * (q31b is the unigram row), count desc with lexicographic tiebreak
    * (D1). Scale: explode → partial-combining hash agg on (ngram) →
    * TakeOrdered(k); one shuffle of (ngram, partial count), never a
    * global sort. */
  def topNgrams(docs: DataFrame, n: Int = 2, k: Int = 20): DataFrame = {
    val words = split(col("text"), " ")
    docs.filter(size(words) >= n)
      .select(explode(transform(
        sequence(lit(1), size(words) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j =>
          element_at(words, i + lit(j))): _*))).as("ng"))
      .groupBy("ng").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ng")).limit(k)
  }

  def q56TopNgrams(spark: SparkSession, dir: String): DataFrame =
    topNgrams(load(spark, dir, "documents"))

  /** Q57: fuzzy entity matching (record linkage) — pairs within edit
    * distance `maxDist`, scoped by a blocking column.
    *
    * Candidate generation is LOSSLESS pigeonhole segment blocking
    * (PassJoin — Li, Deng, Feng, VLDB'11, public): the index side splits
    * each string into `maxDist+1` contiguous segments (even partition,
    * longer segments last); `maxDist` edits can touch at most `maxDist`
    * segments, so any string within edit distance `maxDist` preserves at
    * least one segment verbatim, shifted by at most `maxDist` positions
    * (total indels bound the shift). The probe side therefore enumerates,
    * for each candidate index length `l ∈ [len±maxDist]`, each segment's
    * substring at every admissible shift `s ∈ [Δ−d, Δ+d] ∩ [−d, d]`
    * (Δ = probe len − l), and candidates equi-join on
    * `(block, l, segment_idx, segment_value)` — never an O(n²) cross
    * join, and (being an implication of the distance bound) it misses
    * nothing.
    *
    * Verification is `levenshtein(a, b, maxDist)` — the THRESHOLD form:
    * banded O(len·d) DP with early exit (returns −1 past the bound)
    * instead of the full O(len²) table, ~10× cheaper per pair at d=2.
    *
    * Scale notes: the probe-side `distinct` hash-distributes candidates
    * across all shuffle partitions (the round-3 plan ran the whole
    * verify inside ≤25 block-keyed partitions — the actual 47 s
    * bottleneck). On degenerate key sets (fixed-format strings sharing a
    * long constant prefix, e.g. TPC-H `Customer#%09d`) the constant-
    * prefix segments still collide whole blocks — no position-based
    * lossless blocking can avoid that, since every such pair genuinely
    * preserves those segments — but the banded verify + even
    * partitioning keep the degenerate case linear-per-candidate and
    * 32-way parallel, and on realistic (variable, diverse-prefix) name
    * data the segment join prunes candidates by orders of magnitude
    * (pinned in TextOpsSpec). At cluster scale neither side is
    * broadcast-mandatory: the join is a plain equi-join, hot segment
    * values are handled by AQE skew-join splitting. */
  def fuzzyMatchCandidates(df: DataFrame, blockCol: String, idCol: String,
      nameCol: String, maxDist: Int = 2): DataFrame = {
    val k = maxDist + 1
    // Even partition of a length-l string into k segments, longer last:
    // len_i = (l div k) + [i >= k - l%k],  p_i = i*(l div k) + max(0, i-(k-l%k))
    def segLen(l: String, i: Int) =
      s"(($l div $k) + (case when $i >= $k - ($l % $k) then 1 else 0 end))"
    def segPos(l: String, i: Int) =
      s"($i * ($l div $k) + greatest(0, $i - ($k - ($l % $k))))"

    val base = df.select(col(blockCol).cast("long").as("blk"),
      col(idCol).as("id"), col(nameCol).as("name"),
      length(col(nameCol)).as("len"))

    // Index side: one row per (string, segment).
    val segStructs = (0 until k).map { i =>
      expr(s"named_struct('i', $i, " +
        s"'v', substring(name, ${segPos("len", i)} + 1, ${segLen("len", i)}))")
    }
    val index = base
      .select(col("blk").as("blk_b"), col("id").as("id_b"),
        col("name").as("name_b"), col("len").as("lb"),
        explode(array(segStructs: _*)).as("seg"))
      .select(col("blk_b"), col("id_b"), col("name_b"), col("lb"),
        col("seg.i").as("i_b"), col("seg.v").as("seg_v"))

    // Probe side: for each candidate index length l = len+dl and segment
    // i, every substring of the probe at shift s within the admissible
    // window. Generated as three SMALL staged explodes (length delta →
    // segment → shift) with the div/mod segment geometry computed once
    // per level — one giant per-row expression tree would blow past the
    // codegen method limit and fall back to interpreted eval (the
    // first-cut version did, and it dominated the runtime). The bounds
    // filter keeps only in-bounds substrings; out-of-window pairs cannot
    // be within maxDist, so dropping them loses nothing.
    val segStructsOfL = (0 until k).map { i =>
      expr(s"named_struct('i', $i, 'p', ${segPos("l", i)}, " +
        s"'sl', ${segLen("l", i)})")
    }
    // Explicit partition count: this stage is tiny-rows/huge-compute
    // (each candidate row fans out into a levenshtein after the join),
    // and AQE's size-based shuffle coalescing would collapse it to one
    // partition — user-specified repartition counts are exempt.
    val nPart = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt
    val probe = base
      .repartition(nPart, col("blk"), col("id"))
      .select(col("blk"), col("id").as("id_a"), col("name").as("name_a"),
        col("len"),
        explode(array((-maxDist to maxDist).map(lit): _*)).as("dl"))
      .withColumn("l", col("len") + col("dl"))
      .where(col("l") >= 1)
      .select(col("blk"), col("id_a"), col("name_a"), col("len"),
        col("dl"), col("l"), explode(array(segStructsOfL: _*)).as("g"))
      // admissible shift window: s ∈ [−d, d] ∩ [Δ−d, Δ+d], Δ = len−l = −dl
      .withColumn("s", explode(sequence(
        greatest(lit(-maxDist), -col("dl") - maxDist),
        least(lit(maxDist), -col("dl") + maxDist))))
      .withColumn("start", col("g.p") + col("s"))
      .where(col("start") >= 0 && col("start") + col("g.sl") <= col("len"))
      .select(col("blk"), col("id_a"), col("name_a"), col("l"),
        col("g.i").as("i_a"),
        expr("substring(name_a, start + 1, g.sl)").as("probe_v"))
    // No probe-side distinct: repeated substrings (shift windows inside
    // character runs) only add bounded pair multiplicity, which the
    // final distinct removes — a distinct here would cost a shuffle AND
    // hand the stage back to AQE coalescing.

    probe.join(index,
        col("blk") === col("blk_b") && col("l") === col("lb") &&
        col("i_a") === col("i_b") && col("probe_v") === col("seg_v") &&
        col("id_a") < col("id_b"))
      .select(col("blk"), col("id_a"), col("id_b"),
        col("name_a"), col("name_b"))
  }

  def fuzzyMatchPairs(df: DataFrame, blockCol: String, idCol: String,
      nameCol: String, maxDist: Int = 2): DataFrame =
    fuzzyMatchCandidates(df, blockCol, idCol, nameCol, maxDist)
      // threshold form: −1 when the banded DP proves dist > maxDist
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b"), maxDist).cast("long"))
      .where(col("dist") >= 0)
      .select(col("blk"), col("id_a"), col("id_b"), col("dist"))
      .distinct()
      // Distinct AFTER the verify, deliberately: a pair can arrive via
      // up to maxDist+1 matching segments, so deduping first LOOKS like
      // it should cut DP volume ~3× — measured, it is 5× SLOWER (7 s →
      // 35 s at sf0.1): the distinct's exchange is a tiny-bytes/
      // huge-compute boundary that AQE size-coalesces to a few
      // partitions, capping the levenshtein stage's parallelism (the
      // same trap as the candidate join, see the explicit repartition
      // in fuzzyMatchCandidates). Verifying in the join's output
      // partitioning keeps all 32 tasks busy; the redundant DP on
      // multi-segment pairs is the cheaper evil.

  def q57FuzzyMatch(spark: SparkSession, dir: String): DataFrame =
    fuzzyMatchPairs(load(spark, dir, "customer"), "c_nationkey",
      "c_custkey", "c_name")
      .withColumnRenamed("blk", "nation")
      .orderBy("nation", "id_a", "id_b")

  /** Q59: TF-IDF top-k terms per document — the keyword-extraction /
    * relevance-weighting primitive of every text pipeline. The idf is
    * the integer-scaled rational `(N·10000) div df` instead of the
    * textbook `ln(N/df)`: monotone in the same quantity, but exactly
    * representable in BIGINT on both engines (IEEE `ln` is not
    * guaranteed bit-identical across libm implementations, and D6 bans
    * representation-sensitive outputs). A `logIdf` double variant is
    * what production would use; the gated query uses the rational form.
    *
    * Scale: explode → two hash aggs (tf on (doc,term), df on term) →
    * broadcast 1-row corpus count → per-doc window top-k. The df side
    * shuffles (term, doc_id) pairs, never text; the window partitions
    * by doc_id so no single reducer sees more than one document's
    * terms. */
  def tfidfTopTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = terms.groupBy("term")
      .agg(countDistinct(col("doc_id")).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term").asc)
    tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        col("tf") * expr("(n_docs * 10000L) div df"))
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .where(col("rnk") <= k)
      .select(col("doc_id"), col("term"), col("score"), col("rnk"))
      .orderBy("doc_id", "rnk")
  }

  def q59Tfidf(spark: SparkSession, dir: String): DataFrame =
    tfidfTopTerms(load(spark, dir, "documents"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q31a_text_lang" -> (q31Lang _),
    "q31b_text_tokens" -> (q31Tokens _),
    "q56_top_ngrams" -> (q56TopNgrams _),
    "q57_fuzzy_match" -> (q57FuzzyMatch _),
    "q59_tfidf" -> (q59Tfidf _),
    "q32_dedup_exact" -> (q32DedupExact _),
    "q32b_dedup_rows" -> (q32bDedupRows _),
    "tx1_token_count" -> (tx1TokenCount _),
    "tx2_quality" -> (tx2Quality _),
    "tx3_lang_id" -> (tx3LangId _),
    "tx4_fingerprint" -> (tx4Fingerprint _),
  )

  /** tx4 is implementation-only (xxhash64-specific — DuckDB has no
    * xxhash64). tx3 IS oracle-gated (round 2): `size(split(text, re))-1`
    * equals DuckDB's `len(regexp_extract_all(text, re))` (split keeps
    * leading/trailing empties, so parts−1 = match count), and the
    * greatest-struct argmax is replicated by CASE arms evaluated in
    * descending lang order with `>=` (tie → lexicographically larger
    * lang, exactly Spark's struct comparison). */
  val oracle: Map[String, String] = Map(
    "tx3_lang_id" ->
      """WITH scored AS (
        |  SELECT doc_id, lang,
        |    len(regexp_extract_all(text,
        |      '(?i)\b(the|and|of|to|is|in|that|with)\b')) AS s_en,
        |    len(regexp_extract_all(text,
        |      '(?i)\b(der|die|das|und|ist|nicht|mit|ein)\b')) AS s_de,
        |    len(regexp_extract_all(text,
        |      '(?i)\b(le|la|les|et|est|une|dans|pour)\b')) AS s_fr,
        |    len(regexp_extract_all(text,
        |      '(?i)\b(el|los|las|y|es|una|para|como)\b')) AS s_es
        |  FROM documents)
        |SELECT doc_id, lang,
        |  CASE WHEN s_fr >= s_es AND s_fr >= s_en AND s_fr >= s_de THEN 'fr'
        |       WHEN s_es >= s_en AND s_es >= s_de THEN 'es'
        |       WHEN s_en >= s_de THEN 'en'
        |       ELSE 'de' END AS pred_lang
        |FROM scored ORDER BY doc_id""".stripMargin,
    "q31a_text_lang" ->
      """SELECT lang, COUNT(*) AS docs, CAST(SUM(n_chars) AS BIGINT) AS chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q31b_text_tokens" ->
      """SELECT w, COUNT(*) AS c FROM (
        |  SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |GROUP BY w ORDER BY c DESC, w LIMIT 20""".stripMargin,
    // q57: the oracle states the SEMANTICS (all same-block pairs within
    // edit distance 2); the Spark side reaches the same set through the
    // lossless length-band prefilter.
    "q57_fuzzy_match" ->
      """SELECT CAST(a.c_nationkey AS BIGINT) AS nation,
        |  a.c_custkey AS id_a, b.c_custkey AS id_b,
        |  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
        |FROM customer a JOIN customer b
        |  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 2
        |ORDER BY nation, id_a, id_b""".stripMargin,
    // q59: tf/df/n_docs are exact integers; `//` is DuckDB's integer
    // division (Spark `div`). (score, term) is unique per doc, so the
    // row_number ranking is a total order (D1).
    "q59_tfidf" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf
        |       FROM terms GROUP BY doc_id, term),
        |dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df
        |          FROM terms GROUP BY term),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, term, tf * ((n_docs * 10000) // df) AS score
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
        |ranked AS (
        |  SELECT doc_id, term, score,
        |    row_number() OVER (PARTITION BY doc_id
        |                       ORDER BY score DESC, term) AS rnk
        |  FROM scored)
        |SELECT doc_id, term, CAST(score AS BIGINT) AS score,
        |  CAST(rnk AS BIGINT) AS rnk
        |FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,
    "q56_top_ngrams" ->
      """SELECT ng, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        |  SELECT UNNEST(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i+1])) AS ng
        |  FROM (SELECT string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 2)
        |GROUP BY ng ORDER BY cnt DESC, ng LIMIT 20""".stripMargin,
    "q32_dedup_exact" ->
      """SELECT source, COUNT(*) AS n, COUNT(DISTINCT text) AS uniq
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q32b_dedup_rows" ->
      """SELECT COUNT(*) AS uniq_texts FROM (
        |  SELECT DISTINCT text FROM documents)""".stripMargin,
    "tx1_token_count" ->
      """SELECT doc_id, len(string_split(text, ' ')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[a-zA-Z0-9]+')) AS re_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "tx2_quality" ->
      """SELECT doc_id, LENGTH(text) AS chars,
        |  len(string_split(text, ' ')) AS words,
        |  (LENGTH(text) * 100) // len(string_split(text, ' ')) AS mean_wlen_c,
        |  len(regexp_extract_all(text,
        |    '\b(the|a|an|of|to|and|in|is|it)\b')) AS stops,
        |  (len(regexp_extract_all(text,
        |    '\b(the|a|an|of|to|and|in|is|it)\b')) * 10000) //
        |    len(string_split(text, ' ')) AS stop_bp
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
