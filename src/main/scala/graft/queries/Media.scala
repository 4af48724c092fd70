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

  /** PERCEPTUAL-HASH near-dup — the aHash shape real image dedup runs
    * (exact-match on a content-derived fingerprint, NOT pairwise
    * similarity): each record's average-hash over the stub decoder's
    * byte histogram, grouped per (modality, phash). Unlike the exact
    * dedup's md5 groups, a phash bucket is NOT bounded (every solid-
    * color image shares one hash — the boilerplate-chunk problem), so
    * the canonical pick is a min AGGREGATE + join-back (map-side
    * partials, no per-group sort task), never a window over the hash.
    * Only (id, modality, 8-byte hash) shuffles; payload bytes stay at
    * the scan. Superset property spec-asserted: byte-identical
    * payloads always share a phash group. */
  def qMediaPhashDedup(s: SparkSession, d: String): DataFrame = {
    val media = Multimodal.mediaFromDocuments(Tables.documents(s, d))
    val hashes = Multimodal.perceptualHash(s, media).toDF()
    val canon = hashes.groupBy(col("modality"), col("phash"))
      .agg(min(col("media_id")).as("canonical_id"),
        count(lit(1)).as("n_members"))
    hashes.join(canon, Seq("modality", "phash"))
      .select(col("media_id"), col("modality"),
        col("n_bytes").cast("long").as("n_bytes"), col("phash"),
        col("canonical_id"),
        (col("media_id") === col("canonical_id")).as("is_canonical"),
        col("n_members"))
      .orderBy(col("media_id"))
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> (qMultimodalMeta _),
    "q_multimodal_pipeline" -> (qMultimodalPipeline _),
    "q_multimodal_dedup" -> (qMultimodalDedup _),
    "q_media_phash_dedup" -> (qMediaPhashDedup _))

  def oracles: Map[String, String] = Map(
    // the corpus is pure ASCII, so char counts == byte counts and the
    // 8-bin histogram rebuilds from UNICODE(ch) % 8; bit i of the
    // average hash is the integer test 8·h_i > n_bytes
    "q_media_phash_dedup" ->
      """WITH chars AS (
        |  SELECT doc_id, UNNEST(STRING_SPLIT(text, '')) AS ch
        |  FROM documents),
        |hist AS (
        |  SELECT doc_id, UNICODE(ch) % 8 AS b, COUNT(*) AS h
        |  FROM chars GROUP BY 1, 2),
        |ph AS (
        |  SELECT d.doc_id AS media_id,
        |    CASE WHEN d.doc_id % 3 = 0 THEN 'image'
        |      WHEN d.doc_id % 3 = 1 THEN 'audio'
        |      ELSE 'video' END AS modality,
        |    CAST(LENGTH(d.text) AS BIGINT) AS n_bytes,
        |    CAST(COALESCE(SUM(CASE WHEN 8 * h.h > LENGTH(d.text)
        |      THEN 1 << h.b END), 0) AS BIGINT) AS phash
        |  FROM documents d LEFT JOIN hist h ON d.doc_id = h.doc_id
        |  GROUP BY 1, 2, 3),
        |canon AS (
        |  SELECT modality, phash, MIN(media_id) AS canonical_id,
        |    COUNT(*) AS n_members
        |  FROM ph GROUP BY 1, 2)
        |SELECT p.media_id, p.modality, p.n_bytes, p.phash,
        |  c.canonical_id, p.media_id = c.canonical_id AS is_canonical,
        |  c.n_members
        |FROM ph p JOIN canon c USING (modality, phash)
        |ORDER BY p.media_id""".stripMargin,
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
