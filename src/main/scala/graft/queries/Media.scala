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

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> (qMultimodalMeta _))

  def oracles: Map[String, String] = Map(
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
        |FROM f GROUP BY modality ORDER BY modality""".stripMargin)
}
