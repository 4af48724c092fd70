package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal plumbing query (rows-only for the driver; exact feature
  * values are asserted in MultimodalSpec). */
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

  def oracles: Map[String, String] = Map()
}
