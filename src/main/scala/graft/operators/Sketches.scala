package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches — the 100 TB pattern for COUNT
  * (DISTINCT x): an exact distinct needs a full shuffle of every
  * distinct value on every query, while an HLL sketch is built once
  * per shard/partition/day as a few-KB BINARY, persisted, and then
  * MERGED (a cheap associative union) at query time. Rolling windows,
  * cross-source totals, and incremental refresh all become sketch
  * unions instead of re-scans.
  *
  * Backed by Spark's built-in Apache DataSketches HLL functions
  * (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`) —
  * codegen'd, no UDFs. Default lgK=12 ≈ 1.6% relative error at 4 KB
  * per sketch.
  */
object Sketches {

  /** Aggregate a column into an HLL sketch binary. */
  def hllSketch(c: Column, lgK: Int = 12): Column =
    hll_sketch_agg(c, lit(lgK))

  /** Merge previously-built sketch binaries (associative union). */
  def hllMerge(sketch: Column): Column =
    hll_union_agg(sketch, lit(true))

  /** Distinct-count estimate from a sketch binary. */
  def hllEstimate(sketch: Column): Column =
    hll_sketch_estimate(sketch)

  /** Pre-aggregate: one sketch per (group, shard) — the table you
    * persist. Queries then merge shards per group without touching
    * raw data. */
  def shardedSketches(
      df: DataFrame, groupCols: Seq[String], shardCol: String,
      valueCol: String, lgK: Int = 12): DataFrame =
    df.groupBy((groupCols :+ shardCol).map(col): _*)
      .agg(hllSketch(col(valueCol), lgK).as("sketch"))

  /** Merge sharded sketches back to per-group estimates. */
  def mergedEstimates(
      sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg(hllEstimate(hllMerge(col("sketch"))).as("approx_distinct"))
}
