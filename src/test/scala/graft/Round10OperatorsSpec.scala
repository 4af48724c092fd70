package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Round-10 additions: exact-substring DELETION (the removal step of
  * Lee et al. 2022 exact-substring dedup) and CONTENT-DEFINED CHUNKING
  * dedup (Rabin-boundary storage-dedup shape). Planted fixtures run
  * the registered queries unmodified against hand-computed answers. */
class Round10OperatorsSpec extends SparkSpec {

  private def docsDir(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_r10_docs").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("span removal: the shared 8-token span vanishes from every doc, nothing else") {
    // SpanK = 8. S = s1..s8 is planted verbatim in docs 0 and 1 at
    // DIFFERENT positions; every other 8-token window contains at
    // least one doc-unique token, so S is the only duplicated span.
    // Lee et al. semantics: EVERY occurrence is deleted (not
    // keep-first), so both docs lose exactly the 8 covered tokens.
    val s8 = (1 to 8).map(i => s"s$i").mkString(" ")
    val a = s"a1 a2 a3 a4 $s8 a5 a6 a7 a8"    // 16 tokens, S at 4..11
    val b = s"b1 b2 b3 b4 b5 b6 $s8 b7"        // 15 tokens, S at 6..13
    val c = "c1 c2 c3 c4 c5 c6 c7 c8 c9"       // no duplication
    val d = docsDir(Seq((0L, a), (1L, b), (2L, c)))
    val r = graft.queries.DedupSim.qDedupSpanRemoval(spark, d).collect()
      .map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3), x.getString(4)))).toMap
    assert(r(0L) == ((16L, 8L, 0.5, "a1 a2 a3 a4 a5 a6 a7 a8")), s"got $r")
    assert(r(1L) == ((15L, 8L, 0.466667, "b1 b2 b3 b4 b5 b6 b7")), s"got $r")
    assert(r(2L) == ((9L, 0L, 1.0, c)), s"clean doc untouched: $r")
  }

  test("cdc: a shared region re-synchronizes to identical chunks under shifted prefixes") {
    // The content-defined property: boundaries depend only on the
    // trailing CdcW-token window, so the 96-token shared region S
    // produces the SAME interior chunks in all three docs even though
    // different-length prefixes shift its positions — exactly what
    // fixed-stride chunking cannot do. Keep-first by (doc_id, chunk):
    // doc 0 (S alone, first) owns every chunk; the shifted copies in
    // docs 1 and 2 must each re-find duplicated interior chunks.
    val s = (1 to 96).map(i => s"s$i").mkString(" ")
    val d = docsDir(Seq(
      (0L, s),
      (1L, s"pa pb pc $s"),
      (2L, s"qa qb qc qd qe qf qg $s")))
    val r = graft.queries.DedupSim.qDedupCdc(spark, d).collect()
      .map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(r(0L)._1 == 96L && r(0L)._3 == 0L,
      s"first doc owns its chunks: $r")
    assert(r(1L)._4 > 0L, s"3-shifted copy must re-sync chunks: $r")
    assert(r(2L)._4 > 0L, s"7-shifted copy must re-sync chunks: $r")
    // chunk counts tile the token counts
    assert(r(1L)._1 == 99L && r(2L)._1 == 103L, s"token tiling: $r")
  }

  test("cdc: verdict min-length keeps trivial one-token chunk collisions out") {
    // two docs that share ONLY single stop-tokens — any chunking will
    // collide their 1-token chunks, but chunks below CdcMinTok never
    // count as duplication
    val d = docsDir(Seq(
      (0L, (1 to 40).map(i => s"x$i the").mkString(" ")),
      (1L, (1 to 40).map(i => s"y$i the").mkString(" "))))
    val r = graft.queries.DedupSim.qDedupCdc(spark, d).collect()
      .map(x => x.getLong(0) -> x.getLong(4)).toMap
    assert(r.values.forall(_ == 0L),
      s"stop-token chunk collisions must not count as dup: $r")
  }
}
