package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** Streaming twin of the document-curation pipeline (queries.Text
  * .qPipelineCurate): the same quality gate and exact-dedup semantics
  * applied to a continuous document feed.
  *
  * The quality score is stateless column arithmetic, so it runs
  * unchanged on a stream; only the dedup needs state, and that state is
  * bounded by the watermark — fingerprints older than the horizon are
  * evicted, which is the correct trade for an ingest feed (an exact
  * replay arriving months later is re-admitted rather than the cluster
  * holding every fingerprint ever seen).
  */
object DocsStream {

  /** Quality-filter + keep-first fingerprint dedup over a streaming
    * document relation with an `ingest_ts` event-time column. */
  def curateStream(docs: DataFrame, watermarkDelay: String): DataFrame =
    docs
      .withColumn("quality", TextAnalysis.qualityScore(col("text")))
      .where(col("quality") >= 0.5)
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .withWatermark("ingest_ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("fp")
}
