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
  *   2. block on a cheap key (caller-chosen, e.g. last token /
  *      phonetic code / length bucket) so the self-join is an
  *      equi-join — never a cartesian BroadcastNestedLoopJoin;
  *   3. cheap length-band prefilter (|len a − len b| ≤ maxDist is a
  *      levenshtein lower bound) before the O(len²) edit distance,
  *      which runs only inside surviving candidate pairs.
  *
  * Blocking trades recall for tractability by construction (a typo in
  * the block token escapes the join) — that is the documented contract
  * of every production fuzzy matcher; add a second blocking pass on a
  * different key to recover cross-block pairs.
  */
object FuzzyJoin {

  /** Distinct-value fuzzy pairs: (name_a, name_b, dist, n_a, n_b) for
    * every same-block pair of distinct `nameCol` values within
    * `maxDist` edits, with each side's supporting row count. */
  def fuzzyNamePairs(
      rows: DataFrame, nameCol: String, blockOf: Column => Column,
      maxDist: Int): DataFrame = {
    val vocab = rows.groupBy(col(nameCol).as("name"))
      .agg(count(lit(1)).as("n"))
      .withColumn("blk", blockOf(col("name")))
    val a = vocab.select(col("name").as("name_a"), col("n").as("n_a"),
      col("blk"))
    val b = vocab.select(col("name").as("name_b"), col("n").as("n_b"),
      col("blk"))
    a.join(b, "blk")
      .where(col("name_a") < col("name_b"))
      .where(abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .where(col("dist") <= maxDist)
      .select(col("name_a"), col("name_b"), col("dist"),
        col("n_a"), col("n_b"))
  }

  /** Default block key: the last whitespace token (for "adjective
    * noun"-shaped names the noun is the stable part). */
  def lastTokenBlock(name: Column): Column =
    element_at(split(name, " "), -1)
}
