package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join: pairs of rows whose ordering values lie within a
  * radius of each other, without a quadratic cross product.
  *
  * A plain `|a.t − b.t| <= r` predicate has no equi-key, so Spark plans
  * it as BroadcastNestedLoopJoin — O(|A|·|B|), hopeless at scale. The
  * scale shape BANDS the range: bucket `t` into width-`r` bins, join on
  * the bin as an equi-key (each probe row also probes its two neighbor
  * bins), and re-check the exact predicate on the matches. Any pair
  * within `r` differs by at most one bin index, so recall is exact; the
  * shuffle is an ordinary hash join on (partKeys, bin). This is the
  * same trick every distributed interval-join (Flink, Sedona) uses.
  */
object RangeJoin {

  /** All pairs (a, b), a ≠ b, with equal `partCols`, whose `timeCol`
    * values differ by at most `radius`. Both directions are emitted
    * (a,b) and (b,a) — callers wanting unordered pairs filter `<`.
    *
    * `timeCol` must be an integral column (e.g. epoch micros). */
  def selfRangePairs(
      df: DataFrame,
      partCols: Seq[String],
      idCol: String,
      timeCol: String,
      radius: Long): DataFrame = {
    val base = df.select(
      (partCols :+ idCol :+ timeCol).map(col): _*)
    val build = base
      .withColumn("_bin", floor(col(timeCol) / radius))
    // probe side visits its own bin and both neighbors: a match within
    // `radius` can sit at most one bin away
    val probe = base
      .withColumn("_bin",
        explode(array(
          floor(col(timeCol) / radius) - 1,
          floor(col(timeCol) / radius),
          floor(col(timeCol) / radius) + 1)))
    val a = probe.select(
      (partCols.map(c => col(c).as(s"${c}_a")) :+
        col(idCol).as("id_a") :+ col(timeCol).as("t_a") :+
        col("_bin").as("bin_a")): _*)
    val b = build.select(
      (partCols.map(c => col(c).as(s"${c}_b")) :+
        col(idCol).as("id_b") :+ col(timeCol).as("t_b") :+
        col("_bin").as("bin_b")): _*)
    val joinCond = partCols
      .map(c => col(s"${c}_a") === col(s"${c}_b"))
      .foldLeft(col("bin_a") === col("bin_b") &&
        col("id_a") =!= col("id_b"))(_ && _)
    a.join(b, joinCond)
      .where(abs(col("t_a") - col("t_b")) <= radius)
      .select((partCols.map(c => col(s"${c}_a").as(c)) :+
        col("id_a") :+ col("id_b") :+ col("t_a") :+ col("t_b")): _*)
  }

  /** Per-row neighbor count within ±`radius`, zero-preserving: every
    * input row appears with `n_near >= 0`. */
  def neighborCounts(
      df: DataFrame,
      partCols: Seq[String],
      idCol: String,
      timeCol: String,
      radius: Long): DataFrame = {
    val counts = selfRangePairs(df, partCols, idCol, timeCol, radius)
      .groupBy(col("id_a").as(idCol))
      .agg(count(lit(1)).as("n_near"))
    df.select(col(idCol))
      .join(counts, Seq(idCol), "left")
      .withColumn("n_near", coalesce(col("n_near"), lit(0L)))
  }
}
