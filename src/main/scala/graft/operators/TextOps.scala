package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    * distance `maxDist`, scoped by a blocking column. Candidate
    * generation is a LOSSLESS length-banded equi-join: levenshtein ≤ d
    * implies |len(a) − len(b)| ≤ d, so each left row probes only the
    * 2d+1 length bands around its own length inside its block — a hash
    * join on (block, length-band), never an O(n²) cross join, and (being
    * an implication of the distance bound) it misses nothing. The
    * quadratic levenshtein verify runs only on band-collided pairs.
    * Same banding idea as RangeJoin/Dedup: cheap exact prefilter, then
    * verify. */
  def fuzzyMatchPairs(df: DataFrame, blockCol: String, idCol: String,
      nameCol: String, maxDist: Int = 2): DataFrame = {
    val a = df.select(col(blockCol).cast("long").as("blk"),
      col(idCol).as("id_a"), col(nameCol).as("name_a"),
      length(col(nameCol)).as("la"))
    val b = df.select(col(blockCol).cast("long").as("blk_b"),
      col(idCol).as("id_b"), col(nameCol).as("name_b"),
      length(col(nameCol)).as("lb"))
    // (blk, band) are JOIN keys — the hash join only collides rows in
    // the same block whose lengths can possibly be within maxDist
    a.withColumn("band",
        explode(sequence(col("la") - maxDist, col("la") + maxDist)))
      .join(b, col("blk") === col("blk_b") && col("band") === col("lb")
        && col("id_a") < col("id_b"))
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b")).cast("long"))
      .where(col("dist") <= maxDist)
      .select(col("blk"), col("id_a"), col("id_b"), col("dist"))
  }

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
