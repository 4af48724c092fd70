package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) self-join for entity resolution — "which
  * names in this corpus are probably the same thing misspelled?"
  * (the reference's theta-join with an arbitrary predicate, api.py
  * inner_join, specialized to the string-similarity case every data
  * pipeline eventually needs).
  *
  * Scale shape (the classic candidate-generation recipe):
  *   1. collapse to the DISTINCT-name vocabulary first, carrying row
  *      counts — at corpus scale the vocabulary is orders of magnitude
  *      smaller than the row table, and the expensive quadratic work
  *      must only ever see the vocabulary;
  *   2. block on a COMPOUND key: the caller's cheap key (e.g. last
  *      token / phonetic code) PLUS a length band of width maxDist+1,
  *      so the self-join is an equi-join — never a cartesian
  *      BroadcastNestedLoopJoin — and a hot caller-key block (a very
  *      common last token) is subdivided by length instead of going
  *      quadratic. |len a − len b| ≤ maxDist is a levenshtein lower
  *      bound, so qualifying pairs sit in the same or adjacent bands;
  *      the probe side is exploded into its 3 adjacent bands (3× the
  *      vocabulary, a constant) and each qualifying pair then matches
  *      in EXACTLY one band — no recall loss, no duplicates;
  *   3. cheap length-band prefilter before the O(len²) edit distance,
  *      which runs only inside surviving candidate pairs.
  *
  * Blocking trades recall for tractability by construction (a typo in
  * the block token escapes the join); a SECOND blocking pass on a
  * different key recovers cross-block pairs — a pair only escapes both
  * passes when BOTH its keys are corrupted, which for independent
  * typo sites squares the miss rate.
  */
object FuzzyJoin {

  /** Distinct-value fuzzy pairs: (name_a, name_b, dist, n_a, n_b) for
    * every pair of distinct `nameCol` values within `maxDist` edits
    * that share a block under `blockOf` (or `blockOf2`, when given),
    * with each side's supporting row count.
    *
    * With a second key the candidate sets of both passes union and
    * dedup BEFORE the O(len²) edit distance: the dedup shuffle is
    * vocabulary-scale (bounded), and levenshtein runs once per
    * distinct pair. */
  def fuzzyNamePairs(
      rows: DataFrame, nameCol: String, blockOf: Column => Column,
      maxDist: Int,
      blockOf2: Option[Column => Column] = None): DataFrame = {
    val bandWidth = maxDist + 1
    val vocab = rows.groupBy(col(nameCol).as("name"))
      .agg(count(lit(1)).as("n"))
      .withColumn("band", floor(length(col("name")) / lit(bandWidth)))
    def candidates(key: Column => Column): DataFrame = {
      val v = vocab.withColumn("blk", key(col("name")))
      val a = v.select(col("name").as("name_a"), col("n").as("n_a"),
        col("blk"), col("band"))
      val b = v.select(col("name").as("name_b"), col("n").as("n_b"),
        col("blk"),
        explode(array(col("band") - 1, col("band"), col("band") + 1))
          .as("band"))
      a.join(b, Seq("blk", "band"))
        .where(col("name_a") < col("name_b"))
        .where(abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
        .select(col("name_a"), col("name_b"), col("n_a"), col("n_b"))
    }
    val cand = blockOf2.fold(candidates(blockOf))(k2 =>
      candidates(blockOf).unionByName(candidates(k2)).distinct())
    cand
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .where(col("dist") <= maxDist)
      .select(col("name_a"), col("name_b"), col("dist"),
        col("n_a"), col("n_b"))
  }

  /** Default block key: the last whitespace token (for "adjective
    * noun"-shaped names the noun is the stable part). */
  def lastTokenBlock(name: Column): Column =
    element_at(split(name, " "), -1)

  /** Complementary second block key: the FIRST token — recovers pairs
    * whose last token carries the typo. */
  def firstTokenBlock(name: Column): Column =
    element_at(split(name, " "), 1)
}
