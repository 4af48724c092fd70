package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines
  * (SURVEY.md §2, dedup block). None of these are in the reference —
  * they extend its relational surface with the operators a 100 TB
  * corpus cleanup actually needs.
  *
  * Scale design: every variant is linear-scan + shuffle-by-key. The
  * quadratic work (pair comparison) only ever happens inside small
  * candidate buckets produced by a blocking key (hash, LSH band,
  * SimHash prefix, label), never across the whole corpus.
  */
object Dedup {

  /** Word-level n-gram shingles, distinct, as a column expression.
    * 1-based `element_at`; size(words)-(n-1) shingles per doc. */
  def shingles(text: Column, n: Int): Column = {
    val words = split(text, "\\s+")
    // sequence(1, k) with k < 1 would DESCEND in Spark; guard short docs.
    when(size(words) >= n,
      array_distinct(
        transform(
          sequence(lit(1), size(words) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(k => element_at(words, i + k)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact dedup: canonical = lowest doc_id per normalized-text hash.
    * One shuffle on the 128-bit content hash; no pairwise work at all. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("content_hash"))
    docs
      .withColumn("content_hash",
        md5(regexp_replace(trim(lower(col(textCol))), "\\s+", " ")))
      .withColumn("canonical_id", min(col(idCol)).over(w))
      .withColumn("is_canonical", col(idCol) === col("canonical_id"))
  }

  /** Exact word-3-gram Jaccard similarity between two shingle arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      greatest(size(array_union(a, b)).cast("double"), lit(1.0))

  /** Near-dup pairs by exact Jaccard within blocking buckets —
    * the correctness baseline that MinHash-LSH approximates.
    *
    * Distributed shape: explode each doc's distinct shingle hashes and
    * self-join on (block, shingle) — a pair's match count IS its
    * intersection size, and |A∪B| = |A|+|B|−|A∩B|. This is one shuffle
    * on the shingle hash + one aggregation on the pair key; per-pair
    * array intersection (the naive form) re-walks both arrays for
    * every pair and was ~2× slower even at sf0.1. Pairs sharing no
    * shingle never materialize at all. Comparing 8-byte hashes instead
    * of shingle strings is exact up to xxhash64 collisions (~n²/2⁶⁴). */
  def ngramJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[String], n: Int, threshold: Double): DataFrame = {
    val withShingles = docs
      .select(
        (col(idCol).as("id") +: blockCols.map(col)) :+
          shingles(col(textCol), n).as("shs"): _*)
      .select(
        (col("id") +: blockCols.map(col)) :+ shingleHashes(col("shs")).as("sh"): _*)
      .withColumn("sz", size(col("sh")))
    val ex = withShingles.select(
      (col("id") +: col("sz") +: blockCols.map(col)) :+ explode(col("sh")).as("h"): _*)
    val a = ex.select(
      col("id").as("id_a") +: col("sz").as("sz_a") +: col("h").as("h_a") +:
        blockCols.map(c => col(c).as(s"${c}_a")): _*)
    val b = ex.select(
      col("id").as("id_b") +: col("sz").as("sz_b") +: col("h").as("h_b") +:
        blockCols.map(c => col(c).as(s"${c}_b")): _*)
    val joinCond = blockCols
      .map(c => col(s"${c}_a") === col(s"${c}_b"))
      .foldLeft(col("id_a") < col("id_b") && col("h_a") === col("h_b"))(_ && _)
    a.join(b, joinCond)
      .groupBy(col("id_a"), col("id_b"), col("sz_a"), col("sz_b"))
      .agg(count(lit(1)).as("n_inter"))
      .withColumn("jaccard", round(
        col("n_inter").cast("double") /
          greatest((col("sz_a") + col("sz_b") - col("n_inter")).cast("double"),
            lit(1.0)), 6))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // ---- MinHash + LSH -----------------------------------------------

  /** Number of hash functions and LSH band geometry (16 bands × 4 rows:
    * catches jaccard ≳ 0.5 with high probability). */
  val NumHashes = 64
  val BandRows = 4
  val NumBands: Int = NumHashes / BandRows

  /** MinHash signature as a NumHashes-long array column.
    *
    * PERFORMANCE CONTRACT: `hashes` must be a *materialized* column of
    * `array<long>` (one xxhash64 per shingle, see `shingleHashes`), not
    * an inline expression tree — higher-order functions are interpreted
    * (CodegenFallback), so an inline subtree would be re-evaluated once
    * per hash family member (64×). The i-th family member re-mixes the
    * precomputed long with xxhash64(h, i); min over the array. */
  def minhashSignature(hashes: Column): Column = {
    val sigs = (0 until NumHashes).map { i =>
      array_min(transform(hashes, h => xxhash64(h, lit(i))))
    }
    array(sigs: _*)
  }

  /** One 64-bit hash per shingle — evaluate ONCE per row and reuse. */
  def shingleHashes(sh: Column): Column = transform(sh, s => xxhash64(s))

  /** LSH candidate pairs: explode signatures into (band, band-hash)
    * buckets, self-join buckets, dedup pairs. Linear in corpus size;
    * pairwise work only inside buckets. */
  def minhashCandidates(
      docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    // two explicit projection steps so shingling + hashing run once per
    // row; only then fan out into the 64 signature expressions
    val sig = docs
      .select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
      .select(col("id"), shingleHashes(col("sh")).as("hs"))
      .select(col("id"), minhashSignature(col("hs")).as("sig"))
    val bands = sig.select(
      col("id"),
      explode(
        array((0 until NumBands).map { bnd =>
          struct(
            lit(bnd).as("band"),
            xxhash64((0 until BandRows).map(r =>
              element_at(col("sig"), bnd * BandRows + r + 1)): _*).as("bucket"))
        }: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") &&
        col("x.bucket") === col("y.bucket") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
  }

  /** Full MinHash-LSH near-dup pipeline: LSH candidates re-checked with
    * exact Jaccard (the standard verify step). */
  def minhashDedup(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame = {
    val sh = docs.select(col(idCol).as("id_sh"),
      shingleHashes(shingles(col(textCol), n)).as("sh"))
    minhashCandidates(docs, idCol, textCol, n)
      .join(sh.withColumnRenamed("id_sh", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("id_sh", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("jaccard", round(jaccard(col("sh_a"), col("sh_b")), 6))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // ---- SimHash ------------------------------------------------------

  /** 64-bit SimHash from a MATERIALIZED `array<long>` token-hash
    * column: per bit, sign of the sum of ±1 contributions. The 64
    * per-bit passes only do long arithmetic over the precomputed
    * array — the tokenization/hashing cost is paid once in
    * `tokenHashes`. (At true 100 TB scale this is the one operator
    * worth a native codegen Expression; the bucketing/join topology
    * around it is already the scalable part.) */
  def simhashFromHashes(hashes: Column): Column = {
    val bits = (0 until 64).map { b =>
      val contrib = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(contrib > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** One xxhash64 per whitespace token — evaluate once per row. */
  def tokenHashes(text: Column): Column =
    transform(split(text, "\\s+"), t => xxhash64(t))

  /** 64-bit SimHash over whitespace tokens (convenience; for hot paths
    * materialize `tokenHashes` first — see simhashPairs). */
  def simhash(text: Column): Column = simhashFromHashes(tokenHashes(text))

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: block on ANY of the four 16-bit chunks
    * (pigeonhole: hamming ≤ 3 ⟹ at least one chunk matches exactly;
    * beyond that recall degrades gracefully), then verify candidates
    * with the full hamming distance. Linear scan + bucket joins. */
  def simhashPairs(
      docs: DataFrame, idCol: String, textCol: String, maxHamming: Int): DataFrame = {
    // materialize token hashes in their own projection so the 64 bit
    // expressions share one tokenization pass (see simhashFromHashes)
    val sigs = docs
      .select(col(idCol).as("id"), tokenHashes(col(textCol)).as("th"))
      .select(col("id"), simhashFromHashes(col("th")).as("sig"))
    val blocks = sigs.select(col("id"), col("sig"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk"),
          shiftrightunsigned(col("sig"), c * 16).bitwiseAND(0xFFFFL).as("blk"))
      }: _*)).as("cb"))
      .select(col("id"), col("sig"),
        col("cb.chunk").as("chunk"), col("cb.blk").as("blk"))
    blocks.as("x").join(blocks.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.blk") === col("y.blk") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        col("x.sig").as("sig_a"), col("y.sig").as("sig_b"))
      .distinct() // pairs colliding in several chunks count once
      .withColumn("hamming", hamming(col("sig_a"), col("sig_b")))
      .where(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
