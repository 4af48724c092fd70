package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** MinHash-LSH and SimHash against planted near-duplicates: the
  * approximate methods must recover the pairs the exact Jaccard
  * baseline finds. */
class DedupSpec extends SparkSpec {

  private lazy val corpus = {
    // long docs so one-token edits stay within a small hamming radius
    val base = ("the quick brown fox jumps over the lazy dog and runs far " +
      "away tonight while the moon rises over the quiet hills and rivers " +
      "flow gently through the valley carrying leaves and small branches " +
      "toward the distant sea where fishermen wait patiently for dawn")
    val nearDup = base.replace("tonight", "today") // jaccard >> 0.5
    val distinct1 = "completely different words about spark query engines and columnar storage"
    val distinct2 = "yet another unrelated document describing window functions in detail here"
    spark.createDataFrame(Seq(
      (0L, base), (1L, nearDup), (2L, distinct1), (3L, distinct2),
      (4L, base) // exact dup of 0
    )).toDF("doc_id", "text")
  }

  test("exact dedup marks lowest doc_id as canonical") {
    val out = Dedup.exactDedup(corpus, "doc_id", "text")
      .select("doc_id", "is_canonical").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out(0L) && !out(4L) && out(1L) && out(2L) && out(3L))
  }

  test("shingles handles docs shorter than n") {
    val out = spark.createDataFrame(Seq((0L, "one two"))).toDF("doc_id", "text")
      .select(Dedup.shingles(col("text"), 3).as("sh"))
      .collect()(0).getSeq[String](0)
    assert(out.isEmpty)
  }

  test("duplicated-span coverage counts cross-document spans only") {
    // docs 10 and 11 share the 10-token passage "a b ... j"; doc 13
    // repeats an 8-token span WITHIN itself only; doc 12 is unique
    val passage = "a b c d e f g h i j"
    val docs = spark.createDataFrame(Seq(
      (10L, s"x1 x2 $passage y1"),               // starts 2,3,4 → cover 10/13
      (11L, s"z1 $passage"),                     // starts 1,2,3 → cover 10/11
      (12L, "p q r s t u v w x y z"),            // unique → 0
      (13L, "m1 m2 m3 m4 m5 m6 m7 m8 m1 m2 m3 m4 m5 m6 m7 m8"), // within-doc only
      (14L, "too short")
    )).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpanStats(docs, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(10L) == ((13L, 3L, 10L, math.rint(10.0 / 13.0 * 1e6) / 1e6)),
      s"doc 10: ${out(10L)}")
    assert(out(11L) == ((11L, 3L, 10L, math.rint(10.0 / 11.0 * 1e6) / 1e6)),
      s"doc 11: ${out(11L)}")
    assert(out(12L) == ((11L, 0L, 0L, 0.0)), s"doc 12: ${out(12L)}")
    assert(out(13L) == ((16L, 0L, 0L, 0.0)), s"doc 13: ${out(13L)}")
    assert(out(14L) == ((2L, 0L, 0L, 0.0)), s"doc 14: ${out(14L)}")
  }

  test("df cap drops stop-shingles so no bucket goes quadratic") {
    // ten docs whose ONLY shared shingle is a planted stop 3-gram,
    // plus one near-dup pair sharing several rare shingles
    val stop = "common header boilerplate"
    val docs = spark.createDataFrame(
      (0 until 10).map(i =>
        (100L + i, s"$stop unique$i alpha$i beta$i gamma$i delta$i")) :+
        (200L, "rare one two three four five six seven") :+
        (201L, "rare one two three four five six eight")
    ).toDF("doc_id", "text")
    def pairs(cap: Int) = Dedup.ngramJaccardPairs(
        docs, "doc_id", "text", blockCols = Nil, n = 3, threshold = 0.0,
        dfCap = cap)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // cap 5 < 10 sharers: the stop shingle drops BEFORE the self-join,
    // so the filler docs produce zero pair rows even at threshold 0 —
    // the candidate set is bounded by construction — while the planted
    // near-dups (all shingle dfs = 2) survive untouched
    val capped = pairs(5)
    assert(capped.contains((200L, 201L)), s"near-dup lost: $capped")
    assert(!capped.exists(p => p._1 >= 100L && p._1 < 110L && p._2 < 110L),
      s"stop-shingle pairs leaked through the cap: $capped")
    // without the cap the same stop shingle materializes all 45 pairs
    assert(pairs(Int.MaxValue)
      .count(p => p._1 >= 100L && p._1 < 110L && p._2 < 110L) == 45)
  }

  test("minhash-LSH recovers the exact-jaccard near-dup pairs") {
    val exact = Dedup.ngramJaccardPairs(
        corpus, "doc_id", "text", blockCols = Nil, n = 3, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Dedup.minhashDedup(corpus, "doc_id", "text", n = 3, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.contains((0L, 1L)) && exact.contains((0L, 4L)))
    assert(exact == approx) // verify step makes LSH output exact-equal
  }

  test("per-row band expression is bit-identical to the batch banding") {
    val viaExpr = corpus.select(col("doc_id"),
        explode(Dedup.minhashBandsExpr(col("text"), 3)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val viaBatch = Dedup
      .minhashBands(Dedup.minhashShingleRows(corpus, "doc_id", "text", 3))
      .select(col("id"), col("band"), col("bucket"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaExpr == viaBatch)
    // a doc too short to shingle yields an empty band array
    val short = spark.createDataFrame(Seq((0L, "one two"))).toDF("doc_id", "text")
      .select(size(Dedup.minhashBandsExpr(col("text"), 3))).collect()(0).getInt(0)
    assert(short == 0)
  }

  test("simhash: identical docs collide, near-dups within hamming 8") {
    val pairs = Dedup.simhashPairs(corpus, "doc_id", "text", maxHamming = 8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs((0L, 4L)) == 0) // exact dup → distance 0
    assert(pairs.contains((0L, 1L))) // near dup within 8 bits
    assert(!pairs.contains((2L, 3L)) || pairs((2L, 3L)) > 8)
    ()
  }
}
