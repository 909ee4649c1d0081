package graft

import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.operators.{CorpusPrep, Sampling}

/** Corpus-preparation operators (q64–q68): normalization, PII
  * redaction, sequence packing, repetition filtering, stratified
  * sampling. The hard gate is the DuckDB oracle; these specs pin the
  * operator-level LAWS the oracle can't state (idempotence, detector
  * exhaustiveness, packing conservation/capacity, rate exactness). */
class CorpusPrepSpec extends SparkSpecBase {

  test("q64 normalization is idempotent and produces only [a-z0-9 ]") {
    val docs = load(spark, sf, "documents").limit(50)
    val once = docs.select(col("doc_id"),
      CorpusPrep.normalizeText(concat(lit(" A!b  "), col("text"))).as("n"))
    val twice = once.select(col("doc_id"),
      CorpusPrep.normalizeText(col("n")).as("n"))
    assert(once.collect().toSet == twice.collect().toSet)
    val bad = once.filter(col("n").rlike("[^a-z0-9 ]")).count()
    assert(bad == 0L)
    // no leading/trailing/double spaces survive
    assert(once.filter(col("n").rlike("^ | $|  ")).count() == 0L)
  }

  test("q65 redaction leaves no detectable PII behind") {
    val out = CorpusPrep.q65PiiRedact(spark, sf)
    val residual = out.filter(
      regexp_count(col("redacted"), lit(CorpusPrep.EmailRe)) +
        regexp_count(col("redacted"), lit(CorpusPrep.SsnRe)) +
        regexp_count(col("redacted"), lit(CorpusPrep.PhoneRe)) > 0)
    assert(residual.count() == 0L)
    // every row had all three PII kinds planted
    assert(out.filter(col("pii_found") < 3).count() == 0L)
    assert(out.filter(col("redacted").contains("[EMAIL]") &&
      col("redacted").contains("[SSN]") &&
      col("redacted").contains("[PHONE]")).count() == out.count())
  }

  test("q66 packing conserves docs/tokens, chunks are contiguous, and " +
      "every chunk but a shard's last starts at full capacity") {
    val docs = load(spark, sf, "documents")
    val placed = CorpusPrep.packSequences(docs, "source", "doc_id",
      size(split(col("text"), " ")), 512)
    assert(placed.count() == docs.count())
    val tokTotal = placed.agg(sum("tokens")).head.getLong(0)
    val expected = docs
      .select(size(split(col("text"), " ")).cast("long").as("t"))
      .agg(sum(col("t"))).head.getLong(0)
    assert(tokTotal == expected)
    // a doc starting in chunk c implies every earlier chunk is full:
    // start < (chunk+1)*512 and start >= chunk*512 by definition
    assert(placed.filter(col("start") < col("chunk") * 512 ||
      col("start") >= (col("chunk") + 1) * 512).count() == 0L)
    // chunk ids per shard are 0..max with no holes
    val perShard = placed.groupBy("shard")
      .agg(countDistinct(col("chunk")).as("n"), max(col("chunk")).as("mx"))
    assert(perShard.filter(col("n") =!= col("mx") + 1).count() == 0L)
  }

  test("q67 repetition metrics are within bounds and the planted " +
      "pathological doc is dropped") {
    import spark.implicits._
    val planted = Seq(
      (1L, "a b c d e f g h i j"),            // all-distinct bigrams
      (2L, "x y x y x y x y x y x y")         // one bigram pair repeated
    ).toDF("doc_id", "text")
    val m = CorpusPrep.repetitionMetrics(planted).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(m(1L).getAs[Long]("dup_bigram_bp") == 0L)
    assert(m(1L).getAs[Long]("kept") == 1L)
    // 11 bigrams, 2 distinct ("x y" and "y x") → 9/11 dup ≈ 8181 bp
    assert(m(2L).getAs[Long]("dup_bigram_bp") == 8181L)
    assert(m(2L).getAs[Long]("kept") == 0L)
    val corpus = CorpusPrep.q67Repetition(spark, sf)
    assert(corpus.filter(col("dup_word_bp") < 0 ||
      col("dup_word_bp") > 10000).count() == 0L)
  }

  test("q68 stratified sample: membership is exactly the per-stratum " +
      "bucket predicate and rates order correctly") {
    val docs = load(spark, sf, "documents")
    val sampled = CorpusPrep.q68StratSample(spark, sf)
    // en gets 8/16, zh gets 1/16: recompute membership independently
    val expected = docs
      .withColumn("b", Sampling.md5Bucket(col("doc_id")))
      .withColumn("pos", conv(col("b"), 16, 10).cast("long") + 1)
      .filter(col("pos") <= when(col("lang") === "en", 8)
        .when(col("lang") === "de", 4).when(col("lang") === "fr", 4)
        .when(col("lang") === "es", 2).when(col("lang") === "zh", 1)
        .otherwise(0))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = sampled.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expected)
    // deterministic: a second run is identical
    val again = CorpusPrep.q68StratSample(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == got)
  }

  test("q69 chunking laws: count, reassembly, and tail truncation") {
    import spark.implicits._
    val doc = ("abcdefghij" * 35).take(347) // 347 chars
    val df = Seq((1L, doc, 347L), (2L, "short", 5L))
      .toDF("doc_id", "text", "n_chars")
    val chunks = CorpusPrep.chunkDocuments(df, window = 200, stride = 150)
      .orderBy("doc_id", "chunk_idx").collect()
    val d1 = chunks.filter(_.getLong(0) == 1L)
    // starts 0, 150, 300 → 3 chunks; ceil(n_chars / stride)
    assert(d1.length == 3)
    assert(d1.map(_.getAs[Long]("chunk_len")).toSeq == Seq(200L, 197L, 47L))
    // stride-prefixes concatenate back to the exact document
    val rebuilt = d1.map(_.getAs[String]("chunk").take(150)).mkString
    assert(rebuilt == doc)
    // consecutive chunks overlap by window - stride chars
    assert(d1(0).getAs[String]("chunk").drop(150) ==
      d1(1).getAs[String]("chunk").take(50))
    val d2 = chunks.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2.head.getAs[String]("chunk") == "short")
  }

  test("q70 dup spans: verbatim duplicate ⇒ 10000 bp, unique doc ⇒ 0 bp") {
    import spark.implicits._
    val a = "one two three four five six seven eight"
    val b = "alpha beta gamma delta epsilon zeta eta theta"
    val df = Seq((1L, a), (2L, a), (3L, b)).toDF("doc_id", "text")
    val m = CorpusPrep.dupSpans(df, k = 5).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("dup_bp")).toMap
    assert(m(1L) == 10000L && m(2L) == 10000L, "verbatim pair fully dup")
    assert(m(3L) == 0L, "unique doc has no repeated 5-gram")
  }

  test("q77 span removal: planted duplicates vanish, the shared span " +
      "alone is cut from a partial overlap, unique docs pass through") {
    import spark.implicits._
    val df = Seq(
      (1L, "p q r s t u v w x y"), // identical to 2 → fully removed
      (2L, "p q r s t u v w x y"),
      (3L, "p q r s t m n o k l"), // shares only the first 5-gram
      (4L, "aa bb cc dd ee ff gg"), // unique → untouched
      (5L, "one two three") // too short for a 5-gram → verbatim
    ).toDF("doc_id", "text")
    val out = CorpusPrep.removeDupSpans(df, k = 5).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getAs[Long]("n_kept"),
          r.getAs[Long]("n_removed"))).toMap
    assert(out(1L) == (("", 0L, 10L)))
    assert(out(2L) == (("", 0L, 10L)))
    assert(out(3L) == (("m n o k l", 5L, 5L)))
    assert(out(4L) == (("aa bb cc dd ee ff gg", 7L, 0L)))
    assert(out(5L) == (("one two three", 3L, 0L)))
  }

  test("q257 pack-audit hand golden: a doc straddling the 512 boundary " +
      "counts as split; fill measures the trailing partial chunk") {
    import spark.implicits._
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    // lengths 300, 300, 200 in doc order: starts 0/300/600; doc 2
    // spans [300, 599] — crosses 512 → split; chunks used = 2;
    // fill = 800e6 div 1024 = 781250
    val tmp = java.nio.file.Files.createTempDirectory("q257").toString
    Seq((1L, words(300)), (2L, words(300)), (3L, words(200)))
      .toDF("doc_id", "text").withColumn("source", lit("s"))
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = CorpusPrep.q257PackAudit(spark, tmp).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getAs[Long]("n_docs"), r.getAs[Long]("tok_sum"),
      r.getAs[Long]("n_split"), r.getAs[Long]("split_ppm"),
      r.getAs[Long]("n_chunks"), r.getAs[Long]("fill_ppm")) ==
      ((3L, 800L, 1L, 333333L, 2L, 781250L)), s"${r.toSeq}")
  }

  test("q245 substring dedup golden: a 12-word shared span is ONE row " +
      "with its true extent (L = 8 reports span_len = 12 — invisible " +
      "to fixed-k gram reports), a 7-word overlap is below threshold") {
    import spark.implicits._
    val span = (1 to 12).map(i => s"c$i").mkString(" ")
    val df = Seq(
      (1L, s"p1 p2 $span s1"), // span at positions 3..14
      (2L, s"q1 $span q2 q3"), // span at positions 2..13
      // 7-word overlap with doc 1's prefix region — under L = 8
      (3L, "z1 " + (1 to 7).map(i => s"c$i").mkString(" ") + " z2 z3")
    ).toDF("doc_id", "text")
    val got = CorpusPrep.substringDupSpans(df, minLen = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == Seq((1L, 3L, 2L, 2L, 12L)), s"$got")
  }

  test("q245 planted-boilerplate corpus (one 8-gram in 60 docs): " +
      "capped ≡ uncapped for cap ∈ {4, 10⁶} — the whale tiling " +
      "emits exactly the C(60,2)·extensions true span pairs") {
    import spark.implicits._
    val header = (1 to 10).map(i => s"lic$i").mkString(" ")
    val docs = (1L to 60L).map(d =>
      (d, s"u${d}a u${d}b $header u${d}c")).toDF("doc_id", "text")
    val small = CorpusPrep.substringDupSpans(docs, minLen = 8, cap = 4)
      .collect().map(_.toSeq).toSet
    val uncapped = CorpusPrep
      .substringDupSpans(docs, minLen = 8, cap = 1000000)
      .collect().map(_.toSeq).toSet
    assert(small == uncapped)
    // every cross-doc pair shares exactly the 10-word header span,
    // which starts at position 3 in every doc
    assert(small.size == 60 * 59 / 2, s"${small.size}")
    assert(small.forall { s =>
      s(1) == 3L && s(3) == 3L && s(4) == 10L
    }, small.take(3).toString)
  }

  test("q245 substring dedup: same-doc periodicity — overlapping " +
      "occurrences are maximal spans per diagonal ('x x x x x', " +
      "L = 2 → three spans of lengths 4, 3, 2)") {
    import spark.implicits._
    val df = Seq((9L, "x x x x x")).toDF("doc_id", "text")
    val got = CorpusPrep.substringDupSpans(df, minLen = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == Set(
      (9L, 1L, 9L, 2L, 4L), // [1..4] ≡ [2..5]
      (9L, 1L, 9L, 3L, 3L), // [1..3] ≡ [3..5]
      (9L, 1L, 9L, 4L, 2L)), s"$got") // [1..2] ≡ [4..5]
  }

  test("q78 corpus report: hand-computed card on a planted corpus") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c", "en", "s1", 5L),
      (2L, "a b c", "en", "s1", 5L),    // exact dup of 1 (cross-source ok)
      (3L, "d e f g", "fr", "s1", 7L),
      (4L, "a b c", "de", "s2", 5L)     // dup of 1/2, other source
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = CorpusPrep.corpusReport(df).orderBy("source").collect()
    val s1 = out(0)
    assert(s1.getString(0) == "s1" && s1.getLong(1) == 3L)
    assert(s1.getAs[Long]("tok_sum") == 10L) // 3 + 3 + 4
    assert(s1.getAs[Double]("avg_chars") == 17.0 / 3)
    assert(s1.getAs[Long]("en_bp") == 6666L)
    assert(s1.getAs[Long]("dup_bp") == 6666L) // docs 1,2 are dups
    val s2 = out(1)
    assert(s2.getLong(1) == 1L && s2.getAs[Long]("dup_bp") == 10000L)
  }

  test("q81/q82: overlap symmetric-planted, novelty boundary cases") {
    import spark.implicits._
    val docs = Seq(
      ("sA", "a b c d"),   // grams: "a b c", "b c d"
      ("sB", "a b c x"),   // shares "a b c" with sA; "b c x" exclusive
      ("sC", "p q r s")    // fully disjoint vocabulary
    ).toDF("source", "text")
    val ov = CorpusPrep.sourceOverlap(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // only the (sA, sB) pair shares a gram; sC appears in no pair row
    assert(ov.toSeq == Seq(("sA", "sB", 1L)))
    val rows = CorpusPrep.sourceNovelty(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(rows("sA") == ((2L, 1L, 5000L))) // "b c d" exclusive
    assert(rows("sB") == ((2L, 1L, 5000L)))
    assert(rows("sC") == ((2L, 2L, 10000L))) // disjoint → fully novel
  }

  test("q83: histogram conserves doc and token totals") {
    val docs = load(spark, sf, "documents")
    val out = CorpusPrep.lengthHistogram(docs).collect()
    val totalDocs = out.map(_.getAs[Long]("n_docs")).sum
    val totalToks = out.map(_.getAs[Long]("tok_sum")).sum
    assert(totalDocs == docs.count())
    import org.apache.spark.sql.functions.{col, size, split, sum}
    val expectToks = docs
      .agg(sum(size(split(col("text"), " ")).cast("long"))).head.getLong(0)
    assert(totalToks == expectToks)
    // buckets are within range and strictly increasing
    val buckets = out.map(_.getAs[Long]("bucket"))
    assert(buckets.sameElements(buckets.sorted.distinct))
    assert(buckets.forall(b => b >= 0 && b <= 15))
  }

  test("q71 mixture: smallest stratum keeps rate 16 and survives whole") {
    val out = CorpusPrep.q71Mixture(spark, sf).collect()
    val docs = load(spark, sf, "documents")
    val counts = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val mn = counts.values.min
    val smallest = counts.collect { case (s, c) if c == mn => s }.toSet
    out.filter(r => smallest.contains(r.getString(0))).foreach { r =>
      assert(r.getAs[Long]("rate16") == 16L)
      assert(r.getAs[Long]("n_kept") == counts(r.getString(0)),
        "rate-16 stratum is kept in full")
    }
    // derived rates match the closed form for every stratum in the output
    out.foreach { r =>
      assert(r.getAs[Long]("rate16") == (16L * mn) / counts(r.getString(0)))
    }
  }

  test("q148 lang×source lift: margins reconcile and cells sum to N") {
    val rows = CorpusPrep.q148LangSourceLift(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4))))
    val n = rows.map(_._2._1).sum
    val rowTot = rows.groupBy(_._1._1).view
      .mapValues(_.map(_._2._1).sum).toMap
    val colTot = rows.groupBy(_._1._2).view
      .mapValues(_.map(_._2._1).sum).toMap
    assert(n == load(spark, sf, "documents").count())
    rows.foreach { case ((lang, source), (obs, liftPpm, excess)) =>
      val rt = rowTot(lang); val ct = colTot(source)
      assert(liftPpm == (obs * n * 1000000L) / (rt * ct))
      assert(excess == obs * n - rt * ct)
    }
    // the lift is centered: positive-excess cells have lift > 1e6,
    // negative-excess cells < 1e6 (integer floor keeps the boundary)
    rows.foreach { case (_, (_, liftPpm, excess)) =>
      if (excess > 0) assert(liftPpm >= 1000000L)
      else if (excess < 0) assert(liftPpm < 1000000L)
    }
  }

  test("q272 quality score ≡ pure-Scala driver replay on a literal " +
      "corpus incl. unicode and degenerate docs (round-13)") {
    import spark.implicits._
    import org.apache.spark.unsafe.types.UTF8String
    val texts = Seq(
      (1L, "alpha beta gamma alpha beta"),
      (2L, "x"),
      (3L, ""),
      (4L, "😀word 雪人 mixed 😀word"),
      (5L, "the quick brown fox jumps over the lazy dog"))
    val got = CorpusPrep.qualityScore(texts.toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val wts = CorpusPrep.qsWeights
    val want = texts.map { case (id, t) =>
      val h1 = t.split(" ", -1)
        .map(x => graft.functions.PolyFold.poly(UTF8String.fromString(x)))
      val uni = h1.map(h => wts((h % 64).toInt)).sum
      val bi =
        if (h1.length >= 2)
          h1.sliding(2)
            .map(p => wts((((p(0) * 131L + p(1)) % 1000000007L) % 64L)
              .toInt)).sum
        else 0L
      val nTok = h1.length.toLong
      val nFeats = nTok + math.max(nTok - 1, 0L)
      val score = uni + bi
      // Spark div TRUNCATES toward zero (≡ DuckDB // ≡ Java /) —
      // scores go negative, so plain Java division is the replay
      val mean = (score * 1000) / math.max(nFeats, 1L)
      (id, nTok, nFeats, score, mean, if (mean >= 0) 1L else 0L)
    }
    assert(got.toSeq == want)
    // weight table sanity: both signs present (a one-sided table
    // would make the keep flag vacuous)
    assert(wts.exists(_ > 0) && wts.exists(_ < 0))
  }

  // --------------------------------------- q313 importance sampling

  test("q313 target = corpus identity: when every doc is the target, " +
      "every bucket ratio is exactly 10^6, every doc weighs exactly " +
      "10^6, and the resampler keeps EVERYTHING (bucket20 < 2^20 " +
      "always) — the structural anchor of the weight scale") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma"), (2L, "beta beta delta"),
      (3L, "gamma alpha"), (4L, "epsilon"))
      .toDF("doc_id", "text")
    val got = operators.CorpusPrep
      .importanceWeights(docs, docs.select("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(got.length == 4)
    got.foreach { case (id, w, kept) =>
      assert(w == 1000000L && kept == 1L, s"doc $id: w=$w kept=$kept")
    }
  }

  test("q313 domain separation golden: docs sharing the target's " +
      "vocabulary outweigh vocabulary-disjoint docs (which score " +
      "only residual 64-bucket hash-collision mass — measured " +
      "strictly below every in-domain doc), and the kept flag ≡ an " +
      "independent driver-side md5 replay of the resampling rule") {
    import spark.implicits._
    val docs = Seq(
      (1L, "data pipeline quality data"),
      (2L, "pipeline data checks"),
      (3L, "data pipeline audit"),
      (4L, "quality data pipeline"),
      (5L, "zzq wwk vvj"),
      (6L, "rrt sst uuv")).toDF("doc_id", "text")
    val tgt = docs.filter(col("doc_id") <= 2L).select("doc_id")
    val got = operators.CorpusPrep.importanceWeights(docs, tgt)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    val overlap = Seq(1L, 2L, 3L, 4L).map(got(_)._1)
    val disjoint = Seq(5L, 6L).map(got(_)._1)
    // with only 64 feature buckets, disjoint vocab still COLLIDES
    // into some target buckets (that is the DSIR design trade — a
    // bucketed estimator, not exact set overlap); the selection
    // DIRECTION is the contract: every in-domain doc outweighs
    // every out-of-domain doc
    assert(overlap.min > disjoint.max,
      s"target-domain docs not preferred: $overlap vs $disjoint")
    // kept ≡ the q103 rule replayed driver-side: first five md5 hex
    // nibbles of the id string, bucket·max_w < w·2^20
    val mxw = got.values.map(_._1).max
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket20(id: Long): Long = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      hex.take(5).zipWithIndex.map { case (c, i) =>
        java.lang.Long.parseLong(c.toString, 16) << (4 * (4 - i))
      }.sum
    }
    got.foreach { case (id, (w, kept)) =>
      val want = if (bucket20(id) * mxw < w * 1048576L) 1L else 0L
      assert(kept == want, s"doc $id: kept=$kept want=$want w=$w")
    }
  }
}
