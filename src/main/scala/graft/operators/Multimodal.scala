package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column surface — north star: treat image/audio/video as
  * opaque `binary` columns with typed metadata, and run decode /
  * feature-extract / resize / frame-sample as distributed per-partition
  * batch transforms.
  *
  * The Spark-side plumbing is real and tested: schema (binary payload +
  * typed metadata struct), partition-parallel batched processing via
  * `mapPartitions` on a typed Dataset (the JVM analog of Python's
  * `mapInPandas` — one iterator per partition, amortized per-batch
  * setup), and a projection-pushable metadata path. The actual codecs are
  * STUBBED behind `MediaCodec` with a deterministic fake (image/audio
  * libraries are not in this container); swap the stub for a real decoder
  * without touching any Spark code.
  *
  * 100 TB notes: payloads stay columnar-binary end to end (no base64, no
  * driver collect); decode parallelism = partition count; metadata-only
  * queries never touch payload bytes thanks to parquet column pruning.
  */
object Multimodal {

  /** Typed record for the media table. */
  final case class MediaRow(
      media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, sample_rate: Int, n_frames: Int)

  final case class MediaFeatures(
      media_id: Long, kind: String, feat_dim: Int, features: Array[Float],
      decoded_ok: Boolean)

  /** STUB decode: deterministic feature vector derived from the payload
    * bytes — stands in for e.g. JPEG decode + CNN embed or PCM decode +
    * mel spectrogram. Real implementations replace ONLY this object. */
  object MediaCodec {
    val FeatureDim = 8

    def decodeToFeatures(payload: Array[Byte], kind: String): Array[Float] = {
      // ??? in spirit: a real decoder goes here. Deterministic fake:
      // chunked byte sums, normalized — stable across JVMs/partitions.
      val out = new Array[Float](FeatureDim)
      var i = 0
      while (i < payload.length) {
        out(i % FeatureDim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      val kindSalt = kind.hashCode.toFloat / Int.MaxValue
      out.map(v => v / math.max(1, payload.length / FeatureDim) + kindSalt)
    }

    /** STUB resize: real impl re-encodes pixels; fake keeps bytes,
      * rewrites metadata (the Spark plumbing under test). */
    def resize(row: MediaRow, w: Int, h: Int): MediaRow =
      row.copy(width = w, height = h)

    /** STUB frame sampling: pick every `stride`-th "frame" (fixed-size
      * byte windows stand in for decoded frames). */
    def sampleFrames(payload: Array[Byte], frameBytes: Int,
        stride: Int): Seq[Array[Byte]] =
      payload.grouped(frameBytes).zipWithIndex
        .collect { case (f, i) if i % stride == 0 => f }.toSeq
  }

  /** Build a deterministic synthetic media table from the documents
    * fixture (payload = UTF-8 text bytes; kinds round-robin) — the
    * container ships no real media, so the fixture supplies bytes with
    * realistic skew in length. */
  def syntheticMediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes("UTF-8")
        val kind = Seq("image", "audio", "video")((id % 3).toInt)
        MediaRow(id, kind, payload,
          width = 64 + (id % 8).toInt * 16, height = 64,
          sample_rate = if (kind == "audio") 16000 else 0,
          n_frames = if (kind == "video") payload.length / 32 else 1)
      }
  }

  /** Batched decode → features over partitions: the mapInPandas shape —
    * per-partition iterator, per-batch (here per-partition) setup cost
    * amortized, output is a new typed Dataset. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition setup (real codecs open handles/models here once)
      val dim = MediaCodec.FeatureDim
      rows.map { r =>
        val feats = MediaCodec.decodeToFeatures(r.payload, r.kind)
        MediaFeatures(r.media_id, r.kind, dim, feats, feats.nonEmpty)
      }
    }
  }

  /** Metadata-only aggregate — must never deserialize payload bytes
    * (verified by plan pruning in MultimodalSpec). */
  def metadataStats(media: Dataset[MediaRow]): DataFrame =
    media.toDF()
      .groupBy("kind")
      .agg(count(lit(1)).as("n"),
        max(col("width")).cast("long").as("max_w"),
        sum(col("n_frames")).as("frames"))
      .orderBy("kind")

  /** Frame sampling as a generator: one output row per kept frame. */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int = 32,
      stride: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      MediaCodec.sampleFrames(r.payload, frameBytes, stride)
        .zipWithIndex.map { case (f, i) => (r.media_id, i, f.length) }
    }.toDF("media_id", "frame_no", "frame_bytes")
  }

  /** queries-map entries (implementation-only: stub codec outputs). */
  def qm1Features(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    extractFeatures(syntheticMediaTable(spark, dir))
      .map(f => (f.media_id, f.kind, f.feat_dim, f.decoded_ok,
        f.features.map(x => (x * 1000).round).sum))
      .toDF("media_id", "kind", "feat_dim", "decoded_ok", "feat_checksum")
      .orderBy("media_id")
  }

  def qm2MetadataStats(spark: SparkSession, dir: String): DataFrame =
    metadataStats(syntheticMediaTable(spark, dir))

  def qm3FrameSample(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(syntheticMediaTable(spark, dir))
      .orderBy("media_id", "frame_no")

  /** qm4 — ORACLE-GATED byte-level media facts (round-3 verdict item 6):
    * the codec is a stub, but payload length, md5 digest, and the typed
    * metadata are engine-checkable facts, so the whole media plumbing
    * (synthetic table build, payload projection, metadata typing) sits
    * under the hard DuckDB gate even while decode is fake. */
  def qm4MediaDigest(spark: SparkSession, dir: String): DataFrame =
    syntheticMediaTable(spark, dir).toDF()
      .select(col("media_id"), col("kind"),
        length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("digest"),
        col("width").cast("long").as("width"),
        col("sample_rate").cast("long").as("sample_rate"),
        col("n_frames").cast("long").as("n_frames"))
      .orderBy("media_id")

  /** qm5 — MEDIA DEDUPLICATION by content digest: duplicate payload
    * groups (count, bytes, keeper = min id). Exact byte-level dedup is
    * THE first pass of any multimodal pipeline — before any decode —
    * and needs only the digest: the shuffle carries (digest, id,
    * length), never payload bytes (the q32 hash-first discipline
    * applied to binary columns). */
  def qm5MediaDups(spark: SparkSession, dir: String): DataFrame = {
    val media = syntheticMediaTable(spark, dir).toDF()
      .select(col("media_id"), col("payload"))
    // The synthetic corpus has no byte-identical payloads, so plant
    // re-ingested copies (same bytes, shifted id) for every 10th blob —
    // the re-upload/mirror scenario the digest pass exists to catch.
    media.unionAll(media.filter(col("media_id") % 10 === 0)
        .select((col("media_id") + 1000000L).as("media_id"),
          col("payload")))
      .select(md5(col("payload")).as("digest"),
        length(col("payload")).cast("long").as("nb"), col("media_id"))
      .groupBy("digest")
      .agg(count(lit(1)).as("n"), sum(col("nb")).as("total_bytes"),
        min(col("media_id")).as("keeper"))
      .filter(col("n") > 1)
      .orderBy("digest")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qm1_media_features" -> (qm1Features _),
    "qm2_media_metadata" -> (qm2MetadataStats _),
    "qm3_media_frames" -> (qm3FrameSample _),
    "qm4_media_digest" -> (qm4MediaDigest _),
    "qm5_media_dups" -> (qm5MediaDups _),
  )

  /** qm4 oracle: payload bytes ARE the document's UTF-8 text, so DuckDB
    * reproduces every column from `documents` — md5 over the same bytes
    * (DuckDB md5(VARCHAR) hashes UTF-8), octet_length over text::BLOB,
    * and the metadata formulas inlined. qm1/qm3 stay impl-only (stub
    * codec outputs have no SQL equivalent). */
  val oracle: Map[String, String] = Map(
    // qm5: payload bytes are the document's UTF-8 text (qm4 pin), so
    // DuckDB reproduces digest groups from `documents` directly.
    "qm5_media_dups" ->
      """WITH media AS (
        |  SELECT doc_id AS media_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents
        |  WHERE doc_id % 10 = 0)
        |SELECT md5(text) AS digest, COUNT(*) AS n,
        |  CAST(SUM(octet_length(CAST(text AS BLOB))) AS BIGINT)
        |    AS total_bytes,
        |  MIN(media_id) AS keeper
        |FROM media GROUP BY md5(text) HAVING COUNT(*) > 1
        |ORDER BY digest""".stripMargin,
    "qm4_media_digest" ->
      """SELECT doc_id AS media_id,
        |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
        |       WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |  md5(text) AS digest,
        |  CAST(64 + (doc_id % 8) * 16 AS BIGINT) AS width,
        |  CAST(CASE WHEN doc_id % 3 = 1 THEN 16000 ELSE 0 END AS BIGINT)
        |    AS sample_rate,
        |  CAST(CASE WHEN doc_id % 3 = 2
        |       THEN octet_length(CAST(text AS BLOB)) // 32
        |       ELSE 1 END AS BIGINT) AS n_frames
        |FROM documents ORDER BY media_id""".stripMargin,
  )
}
