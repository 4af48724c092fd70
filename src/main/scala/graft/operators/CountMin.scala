package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable count-min sketch (Cormode & Muthukrishnan 2005): Depth
  * independent md5-derived hash rows over Width buckets. Every counter
  * is an associative sum, so the sketch is mergeable across partitions,
  * executors, and micro-batches — the state is Depth×Width rows
  * FOREVER, regardless of corpus or stream size. Shared by the batch
  * heavy-hitters query (queries.Corpus.qApproxTopk) and the streaming
  * twin (streaming.DocsStream.heavyHittersStream); the hash is pure
  * md5 arithmetic so a DuckDB oracle rebuilds the identical sketch.
  */
object CountMin {

  val Depth = 4
  val Width = 256

  /** Bucket of a token under hash row j: first 6 md5 hex digits of
    * "j:tok" mod Width — engine-portable. */
  def bucket(j: Int, tok: Column): Column =
    conv(substring(md5(concat(lit(s"$j:"), tok)), 1, 6), 16, 10)
      .cast("long") % Width

  /** Sketch of a WEIGHTED vocab relation (tokCol, cCol) — the batch
    * two-level shape: corpus-sized work happens in the upstream count,
    * the ×Depth expansion runs over the compact vocab. */
  def sketch(vocab: DataFrame, tokCol: String, cCol: String): DataFrame =
    (0 until Depth).map { j =>
      vocab.select(lit(j).as("row_id"), bucket(j, col(tokCol)).as("bucket"),
        col(cCol).as("c"))
    }.reduce(_ unionAll _)
      .groupBy(col("row_id"), col("bucket")).agg(sum(col("c")).as("bsum"))

  /** Sketch of a RAW token relation (weight 1 per row) — stream-safe:
    * an unwindowed groupBy over a fixed Depth×Width key space, legal
    * in update/complete mode with state bounded by construction. */
  def sketchRaw(toks: DataFrame, tokCol: String): DataFrame =
    (0 until Depth).map { j =>
      toks.select(lit(j).as("row_id"), bucket(j, col(tokCol)).as("bucket"))
    }.reduce(_ unionAll _)
      .groupBy(col("row_id"), col("bucket"))
      .agg(count(lit(1)).as("bsum"))
}
