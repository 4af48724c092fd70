package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal plumbing query. Fully oracle-checked: the decode stub's
  * outputs are deterministic arithmetic over the payload bytes, and the
  * corpus text is pure ASCII (verified at every SF), so DuckDB can
  * rebuild n_bytes (= LENGTH(text)) and feat[0] (= byte-histogram
  * bucket 0 / n, recomputed per char via UNICODE()) bit-for-bit —
  * the float division is IEEE-correctly-rounded in both engines.
  * Exact per-record feature values are additionally asserted in
  * MultimodalSpec. */
object Media {

  /** Binary payload → per-modality feature aggregates. Exercises the
    * full typed pipeline: binary column + metadata → mapPartitions
    * decode → DataFrame agg. */
  def qMultimodalMeta(s: SparkSession, d: String): DataFrame = {
    val media = Multimodal.mediaFromDocuments(Tables.documents(s, d))
    Multimodal.extractFeatures(s, media).toDF()
      .groupBy(col("modality"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes").cast("long")).as("total_bytes"),
        round(avg(element_at(col("feat"), 1)), 6).as("avg_feat0"))
      .orderBy(col("modality"))
  }

  /** The full multimodal transform pipeline registered end-to-end:
    * frame-sample the video rows (every 4th payload byte stands in
    * for every 4th frame), resize all records, then extract features
    * from the TRANSFORMED payloads — three typed mapPartitions stages
    * chained the way a real decode pipeline would be (codec init
    * amortized per partition, only video rows pay the sampling cost).
    * Deterministic stubs keep it oracle-checkable: DuckDB rebuilds the
    * sampled byte set positionally over the ASCII corpus. */
  def qMultimodalPipeline(s: SparkSession, d: String): DataFrame = {
    val media = Multimodal.mediaFromDocuments(Tables.documents(s, d))
    val sampled = Multimodal.frameSampleVideos(s, media, stride = 4)
    val resized = Multimodal.resizeAll(s, sampled.toDF(), w = 32, h = 24)
    Multimodal.extractFeatures(s, resized.toDF()).toDF()
      .groupBy(col("modality"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes").cast("long")).as("total_bytes"),
        round(avg(element_at(col("feat"), 1)), 6).as("avg_feat0"))
      .orderBy(col("modality"))
  }

  /** Exact MEDIA dedup — q_dedup_exact's keep-first semantics lifted
    * to the binary payload column, per modality (two images with
    * byte-identical payloads dedup; an identical byte string appearing
    * as both an image and an audio clip does NOT — modality is part of
    * the identity). The hash groups are content-duplicate sets
    * (bounded), so the per-group window is safe at any corpus size;
    * at 100 TB the md5 runs next to the scan and only (id, modality,
    * 16-byte hash) ever shuffles — never the payload bytes. */
  def qMultimodalDedup(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val media = Multimodal.mediaFromDocuments(Tables.documents(s, d))
    val w = Window.partitionBy(col("modality"), col("payload_hash"))
    media
      .select(col("media_id"), col("modality"),
        md5(col("payload")).as("payload_hash"))
      .select(col("media_id"), col("modality"), col("payload_hash"),
        min(col("media_id")).over(w).as("canonical_id"),
        (col("media_id") === min(col("media_id")).over(w))
          .as("is_canonical"))
      .orderBy(col("media_id"))
  }

  /** PERCEPTUAL-HASH near-dup over REAL decoded pixels — the aHash
    * shape real image dedup runs (exact-match on a content-derived
    * fingerprint, NOT pairwise similarity): every document plants a
    * deterministic 16×16 grayscale image ENCODED AS A REAL 24-bpp BMP
    * (headers, bottom-up rows, 4-byte row padding), the pipeline
    * DECODES those bytes with the real codec (multimodal.Bmp) and
    * computes aHash + dHash over the decoded pixels, then groups per
    * (modality, ahash). The planted corpus has 7 pixel classes plus a
    * single-pixel jitter on half of each class: the jitter changes the
    * payload bytes (and so the exact-dedup md5) but no aHash bit —
    * exactly the "same image, re-encoded" near-dup a perceptual hash
    * exists to catch, spec-pinned in BmpSpec. Unlike the exact dedup's
    * md5 groups, a phash bucket is NOT bounded (every solid-color
    * image shares one hash — the boilerplate-chunk problem), so the
    * canonical pick is a min AGGREGATE + join-back (map-side partials,
    * no per-group sort task), never a window over the hash. Only (id,
    * modality, two 8-byte hashes) shuffles; payload bytes stay at the
    * decode stage. The oracle replants the same pixels arithmetically
    * and reconstructs both hashes bit-for-bit (signed bit-63 via
    * two's-complement summation). */
  def qMediaPhashDedup(s: SparkSession, d: String): DataFrame = {
    val media = Multimodal.bmpMediaFromDocuments(s, Tables.documents(s, d))
    val hashes = Multimodal.perceptualHashBmp(s, media.toDF()).toDF()
    val canon = hashes.groupBy(col("modality"), col("ahash"))
      .agg(min(col("media_id")).as("canonical_id"),
        count(lit(1)).as("n_members"))
    hashes.join(canon, Seq("modality", "ahash"))
      .select(col("media_id"), col("modality"),
        col("n_bytes").cast("long").as("n_bytes"), col("ahash"),
        col("dhash"), col("canonical_id"),
        (col("media_id") === col("canonical_id")).as("is_canonical"),
        col("n_members"))
      .orderBy(col("media_id"))
  }

  /** REAL AUDIO FEATURE EXTRACTION over REAL WAV bytes (round 13 —
    * the second genuinely-decoded modality, after round 12's BMP):
    * every document plants a deterministic PCM-16 clip (every 5th doc
    * stereo) ENCODED AS A REAL RIFF/WAVE FILE, the pipeline DECODES
    * those bytes with the real chunk-walking codec (multimodal.Wav)
    * and computes the signal features a training-data audio filter
    * runs — duration, peak amplitude, energy, zero-crossing rate, RMS
    * level (the silence / clipped-clip screens). Every feature is
    * integer-exact (peak/energy/zero-cross as longs; duration by
    * integer floor division) except rms = one ÷ + one √, both
    * correctly-rounded IEEE ops, closed with round-6dp at the query
    * layer in both engines. The oracle replants the same samples
    * arithmetically ((d%7+1)·7919·i + d%997 mod 2¹⁶ − 2¹⁵) and
    * reconstructs every column — agreement proves the WAV encode →
    * decode → interleave round-trip is byte-exact. At 100 TB: decode
    * runs next to the scan in a typed mapPartitions (codec init per
    * partition), only the ~70-byte feature row ever shuffles, never
    * payload bytes. */
  def qAudioFeatures(s: SparkSession, d: String): DataFrame = {
    val media = Multimodal.wavMediaFromDocuments(s, Tables.documents(s, d))
    Multimodal.audioFeaturesWav(s, media.toDF()).toDF()
      .select(col("media_id"), col("channels"), col("sample_rate"),
        col("n_bytes").cast("long").as("n_bytes"),
        col("n_samples").cast("long").as("n_samples"),
        col("duration_ms"), col("peak"), col("energy"), col("zero_cross"),
        round(col("rms"), 6).as("rms"))
      .orderBy(col("media_id"))
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> (qMultimodalMeta _),
    "q_multimodal_pipeline" -> (qMultimodalPipeline _),
    "q_multimodal_dedup" -> (qMultimodalDedup _),
    "q_media_phash_dedup" -> (qMediaPhashDedup _),
    "q_audio_features" -> (qAudioFeatures _))

  def oracles: Map[String, String] = Map(
    // replant the PCM samples arithmetically and rebuild every feature;
    // the Spark side instead ENCODES them as a real WAV and DECODES the
    // bytes back — agreement proves the RIFF round-trip byte-exact.
    // zero crossings are channel-0 only (i % ch = 0), strict sign
    // product; n_bytes = 44-byte canonical header + 2 bytes/sample.
    "q_audio_features" -> {
      val rate = graft.multimodal.Multimodal.WavRate
      s"""WITH par AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 5 = 0 THEN 2 ELSE 1 END AS ch,
         |    64 + 2 * (doc_id % 32) AS n,
         |    (doc_id % 7 + 1) * 7919 AS a,
         |    doc_id % 997 AS b
         |  FROM documents),
         |smp AS (
         |  SELECT doc_id, ch, n,
         |    UNNEST(GENERATE_SERIES(0, n - 1)) AS i, a, b
         |  FROM par),
         |sv AS (
         |  SELECT doc_id, ch, n, i,
         |    (a * i + b) % 65536 - 32768 AS s
         |  FROM smp),
         |agg AS (
         |  SELECT doc_id, MAX(ch) AS ch, MAX(n) AS n,
         |    MAX(ABS(s)) AS peak, SUM(s * s) AS energy
         |  FROM sv GROUP BY 1),
         |c0 AS (
         |  SELECT doc_id, s,
         |    LAG(s) OVER (PARTITION BY doc_id ORDER BY i) AS prev
         |  FROM sv WHERE i % ch = 0),
         |zc AS (
         |  SELECT doc_id,
         |    COALESCE(SUM(CASE WHEN prev * s < 0 THEN 1 ELSE 0 END), 0)
         |      AS zero_cross
         |  FROM c0 GROUP BY 1)
         |SELECT a.doc_id AS media_id,
         |  CAST(a.ch AS INT) AS channels,
         |  CAST($rate AS INT) AS sample_rate,
         |  CAST(44 + 2 * a.n AS BIGINT) AS n_bytes,
         |  CAST(a.n AS BIGINT) AS n_samples,
         |  CAST((a.n // a.ch) * 1000 // $rate AS BIGINT) AS duration_ms,
         |  CAST(a.peak AS BIGINT) AS peak,
         |  CAST(a.energy AS BIGINT) AS energy,
         |  CAST(zc.zero_cross AS BIGINT) AS zero_cross,
         |  ROUND(SQRT(CAST(a.energy AS DOUBLE) / a.n), 6) AS rms
         |FROM agg a JOIN zc USING (doc_id)
         |ORDER BY a.doc_id""".stripMargin
    },
    // replant the pixel arithmetic (pure integers), rebuild block sums
    // on the 8x8 grid (2x2 blocks of the 16x16 image), and reconstruct
    // both hashes; the Spark side instead ENCODES these pixels as a
    // real BMP and DECODES the bytes back — agreement proves the codec
    // round-trips exactly. Signed bit 63 rebuilds via two's-complement
    // summation (-2^63 weight). n_bytes is the BMP's encoded size:
    // 54-byte headers + 16 rows x 48-byte stride = 822.
    "q_media_phash_dedup" -> {
      val dim = graft.multimodal.Multimodal.BmpDim
      val nBytes = graft.multimodal.Bmp.encodedSize(dim, dim)
      val jitterIdx = 3 * dim + 5
      s"""WITH px AS (
         |  SELECT d.doc_id, i.i,
         |    (((d.doc_id % 7) * 17 + 1) * i.i
         |      + 3 * (i.i % $dim) + 5 * (i.i // $dim)) % 256
         |      + CASE WHEN d.doc_id % 14 >= 7 AND i.i = $jitterIdx
         |        THEN 1 ELSE 0 END AS p0
         |  FROM documents d,
         |    (SELECT UNNEST(GENERATE_SERIES(0, ${dim * dim - 1})) AS i) i),
         |pxm AS (SELECT doc_id, i, p0 % 256 AS p FROM px),
         |blk AS (
         |  SELECT doc_id,
         |    (i // ${2 * dim}) * 8 + (i % $dim) // 2 AS b,
         |    SUM(p) AS s
         |  FROM pxm GROUP BY 1, 2),
         |tot AS (SELECT doc_id, SUM(p) AS total FROM pxm GROUP BY 1),
         |dn AS (
         |  SELECT doc_id, b, s,
         |    LEAD(s) OVER (PARTITION BY doc_id, b // 8 ORDER BY b) AS s_next
         |  FROM blk),
         |ph AS (
         |  SELECT blk.doc_id AS media_id,
         |    CAST(COALESCE(SUM(CASE WHEN 64 * blk.s > tot.total THEN
         |      CASE WHEN blk.b = 63 THEN -9223372036854775807 - 1
         |        ELSE 1::BIGINT << blk.b END ELSE 0 END), 0) AS BIGINT)
         |      AS ahash
         |  FROM blk JOIN tot USING (doc_id) GROUP BY 1),
         |dh AS (
         |  SELECT doc_id AS media_id,
         |    CAST(COALESCE(SUM(CASE WHEN b % 8 < 7 AND s_next > s
         |      THEN 1::BIGINT << ((b // 8) * 7 + b % 8) ELSE 0 END), 0)
         |      AS BIGINT) AS dhash
         |  FROM dn GROUP BY 1),
         |m AS (
         |  SELECT ph.media_id,
         |    CASE WHEN ph.media_id % 3 = 0 THEN 'image'
         |      WHEN ph.media_id % 3 = 1 THEN 'audio'
         |      ELSE 'video' END AS modality,
         |    CAST($nBytes AS BIGINT) AS n_bytes, ph.ahash, dh.dhash
         |  FROM ph JOIN dh USING (media_id)),
         |canon AS (
         |  SELECT modality, ahash, MIN(media_id) AS canonical_id,
         |    COUNT(*) AS n_members
         |  FROM m GROUP BY 1, 2)
         |SELECT m.media_id, m.modality, m.n_bytes, m.ahash, m.dhash,
         |  c.canonical_id, m.media_id = c.canonical_id AS is_canonical,
         |  c.n_members
         |FROM m JOIN canon c USING (modality, ahash)
         |ORDER BY m.media_id""".stripMargin
    },
    // payload = the utf-8 text bytes, so MD5(text) IS the payload hash
    "q_multimodal_dedup" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image'
        |      WHEN doc_id % 3 = 1 THEN 'audio'
        |      ELSE 'video' END AS modality,
        |    MD5(text) AS payload_hash
        |  FROM documents)
        |SELECT media_id, modality, payload_hash,
        |  MIN(media_id) OVER (PARTITION BY modality, payload_hash)
        |    AS canonical_id,
        |  media_id = MIN(media_id) OVER (PARTITION BY modality, payload_hash)
        |    AS is_canonical
        |FROM m ORDER BY media_id""".stripMargin,
    "q_multimodal_meta" ->
      """WITH m AS (
        |  SELECT doc_id % 3 AS m3, LENGTH(text) AS n_bytes,
        |    LEN(LIST_FILTER(GENERATE_SERIES(1, LENGTH(text)),
        |      i -> UNICODE(text[i]) % 8 = 0)) AS h0
        |  FROM documents),
        |f AS (
        |  SELECT CASE WHEN m3 = 0 THEN 'image' WHEN m3 = 1 THEN 'audio'
        |    ELSE 'video' END AS modality,
        |    n_bytes,
        |    CAST(h0 AS FLOAT) / CAST(GREATEST(n_bytes, 1) AS FLOAT) AS feat0
        |  FROM m)
        |SELECT modality, COUNT(*) AS n_media,
        |  CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
        |  ROUND(AVG(feat0), 6) AS avg_feat0
        |FROM f GROUP BY modality ORDER BY modality""".stripMargin,
    // video rows keep every 4th byte (positions 1, 5, 9, … 1-based)
    // before feature extraction; image/audio pass through unchanged
    "q_multimodal_pipeline" ->
      """WITH m AS (
        |  SELECT doc_id % 3 AS m3, text FROM documents),
        |p AS (
        |  SELECT CASE WHEN m3 = 0 THEN 'image' WHEN m3 = 1 THEN 'audio'
        |    ELSE 'video' END AS modality,
        |    CASE WHEN m3 = 2
        |      THEN CAST(FLOOR((LENGTH(text) - 1) / 4) + 1 AS BIGINT)
        |      ELSE LENGTH(text) END AS n_bytes,
        |    CASE WHEN m3 = 2
        |      THEN LEN(LIST_FILTER(GENERATE_SERIES(1, LENGTH(text)),
        |        i -> (i - 1) % 4 = 0 AND UNICODE(text[i]) % 8 = 0))
        |      ELSE LEN(LIST_FILTER(GENERATE_SERIES(1, LENGTH(text)),
        |        i -> UNICODE(text[i]) % 8 = 0)) END AS h0
        |  FROM m)
        |SELECT modality, COUNT(*) AS n_media,
        |  CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
        |  ROUND(AVG(CAST(h0 AS FLOAT) / CAST(GREATEST(n_bytes, 1) AS FLOAT)),
        |    6) AS avg_feat0
        |FROM p GROUP BY modality ORDER BY modality""".stripMargin)
}
