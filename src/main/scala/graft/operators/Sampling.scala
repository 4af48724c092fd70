package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling — the reproducible alternative to
  * `df.sample()` for corpus curation: membership depends only on the
  * row's key, never on partitioning, task retries, or cluster size, so
  * the same document lands in the same split on every run and every
  * engine (the MD5-fraction trick is engine-portable, which is also
  * what makes it DuckDB-oracle-checkable).
  *
  * Scale shape: a pure per-row filter — no shuffle, pushes through
  * codegen, and composes with partition pruning. Stratified rates are
  * a CASE expression, not a per-stratum pass.
  */
object Sampling {

  private val HexDigits = 6
  private val Denominator = math.pow(16, HexDigits) // 16^6 = 16,777,216

  /** Uniform [0,1) hash fraction of a key: first 6 hex digits of
    * md5(key) as an integer, scaled. */
  def hashFraction(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, HexDigits), 16, 10)
      .cast("long") / lit(Denominator)

  /** Keep rows whose key hashes below `rate`. */
  def hashSample(df: DataFrame, keyCol: String, rate: Double): DataFrame =
    df.where(hashFraction(col(keyCol)) < rate)

  /** Per-ROW weighted deterministic sample: each row is kept with
    * probability `weight` (clamped to [0, 1]) — the curation shape for
    * quality- or length-proportional downsampling, where the rate is a
    * computed column rather than a per-stratum constant. Still a pure
    * per-row filter: no shuffle, reproducible across runs and engines. */
  def weightedSample(df: DataFrame, keyCol: String, weight: Column): DataFrame =
    df.where(hashFraction(col(keyCol)) < least(lit(1.0), weight))

  /** Stratified deterministic sample: per-stratum keep rates with a
    * default for unlisted strata. */
  def stratifiedSample(
      df: DataFrame, keyCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val rateExpr = rates.foldLeft(lit(defaultRate)) {
      case (acc, (stratum, r)) =>
        when(col(strataCol) === stratum, lit(r)).otherwise(acc)
    }
    df.where(hashFraction(col(keyCol)) < rateExpr)
  }
}
