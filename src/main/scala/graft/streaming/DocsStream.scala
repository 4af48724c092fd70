package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.text.TextAnalysis

/** Streaming twin of the document-curation pipeline (queries.Text
  * .qPipelineCurate): the same quality gate and exact-dedup semantics
  * applied to a continuous document feed.
  *
  * The quality score is stateless column arithmetic, so it runs
  * unchanged on a stream; only the dedup needs state, and that state is
  * bounded by the watermark — fingerprints older than the horizon are
  * evicted, which is the correct trade for an ingest feed (an exact
  * replay arriving months later is re-admitted rather than the cluster
  * holding every fingerprint ever seen).
  */
object DocsStream {

  /** Quality-filter + keep-first fingerprint dedup over a streaming
    * document relation with an `ingest_ts` event-time column. */
  def curateStream(docs: DataFrame, watermarkDelay: String): DataFrame =
    docs
      .withColumn("quality", TextAnalysis.qualityScore(col("text")))
      .where(col("quality") >= 0.5)
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .withWatermark("ingest_ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming twin of the incremental ingest dedup
    * (Dedup.incrementalDedupScreen): screen a continuous document feed
    * against the EXISTING corpus — exact duplicates by content hash,
    * near-duplicate candidates by cross-set MinHash band collisions —
    * emitting one verdict row per document as the watermark finalizes
    * its ingest window.
    *
    * Both corpus sides are STATIC relations (stream-static joins, no
    * state): `corpusHashes` is the distinct content-hash set (`h`),
    * `corpusBands` the corpus band table (cid, band, bucket) — at
    * production scale the same persisted bucketed index the batch
    * screen reads (Dedup.writeBandIndex), refreshed between ingest
    * sessions. The batch side's bands come from the per-row
    * `Dedup.minhashBandsExpr` (bit-identical to the batch banding, so
    * the verdicts match the batch twin — spec-asserted); the only
    * stateful operator is the windowed per-doc collapse, bounded by
    * the watermark. */
  def screenStream(
      docs: DataFrame, corpusHashes: DataFrame, corpusBands: DataFrame,
      watermarkDelay: String, n: Int = 3,
      window_ : String = "1 hour"): DataFrame =
    docs
      .withWatermark("ingest_ts", watermarkDelay)
      .withColumn("h",
        md5(regexp_replace(trim(lower(col("text"))), "\\s+", " ")))
      // explode_outer: a doc shorter than n words has no bands but
      // still gets its verdict row (cid stays null → zero candidates)
      .withColumn("bb", explode_outer(Dedup.minhashBandsExpr(col("text"), n)))
      .select(col("doc_id"), col("ingest_ts"), col("h"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      .join(corpusHashes.select(col("h"), lit(true).as("_hx")).distinct(),
        Seq("h"), "left")
      .join(corpusBands.select(col("cid"), col("band"), col("bucket")),
        Seq("band", "bucket"), "left")
      .groupBy(window(col("ingest_ts"), window_), col("doc_id"),
        coalesce(col("_hx"), lit(false)).as("is_exact_dup"))
      // collect_set skips nulls, so its size IS the distinct count of
      // colliding corpus docs (countDistinct isn't streamable)
      .agg(size(collect_set(col("cid"))).cast("long")
        .as("n_near_candidates"))
      .select(col("doc_id"), col("is_exact_dup"), col("n_near_candidates"),
        (!col("is_exact_dup") && col("n_near_candidates") === 0).as("keep"))

  /** Streaming decontamination screen — the eval-overlap gate
    * (Dedup.contaminationCounts / q_decontaminate) applied to an
    * ingest feed. The eval shingle set is a STATIC relation built once
    * from the frozen eval corpus — broadcast-sized by construction
    * (eval sets are thousands of docs, not the corpus) — so the screen
    * is a stateless stream-static join; the only state is the
    * watermark-bounded per-doc collapse.
    *
    * Per-row shingling uses the column-expression builder
    * (Dedup.shingles; the window-based relational builder isn't
    * stream-safe) and hashes each shingle with the SAME portable
    * md5-15 s_id as the batch path, so verdicts are bit-equal to the
    * batch screen — spec-asserted. explode_outer keeps shingle-less
    * (short) docs: they get a verdict row with zero overlap. */
  /** Streaming heavy-hitters sketch — the count-min twin of
    * queries.Corpus.qApproxTopk. The sketch IS a streaming aggregate:
    * every counter is an associative sum over a FIXED Depth×Width key
    * space, so the state is 1024 rows forever — no watermark needed,
    * no growth with stream length (the property that makes frequency
    * sketches the right tool on an unbounded feed). Emitted in
    * update/complete mode; because the counters are deterministic
    * sums, the sketch after any prefix of batches is bit-equal to the
    * batch sketch over the same rows — spec-asserted. */
  def heavyHittersStream(docs: DataFrame): DataFrame =
    graft.operators.CountMin.sketchRaw(
      docs.select(explode(split(lower(col("text")), "\\s+")).as("tok")),
      "tok")

  /** Streaming exact-substring span DELETION — the stream-static twin
    * of Dedup.spanRemoval: a FROZEN duplicated-span id set (built from
    * the corpus by Dedup.duplicatedSpanIds, refreshed between ingest
    * sessions like the band index) screens a continuous document feed,
    * deleting every token covered by a known duplicated k-span.
    *
    * Per-row spans come from the stream-safe positioned expression
    * (Dedup.spanIdsExpr — the lead() window of the batch builder is
    * not streamable); the dup test is a stateless stream-static join;
    * the per-doc collapse is the one watermark-bounded aggregate. The
    * interval-union coverage and reassembly run as PURE ARRAY
    * expressions after the aggregate (filter-with-index + exists over
    * the collected start set), so verdicts are bit-equal to the batch
    * spanRemoval fed the same corpus — spec-asserted. */
  def spanRemovalStream(
      docs: DataFrame, dupSpans: DataFrame,
      watermarkDelay: String, k: Int = Dedup.SpanK,
      window_ : String = "1 hour"): DataFrame = {
    val collected = docs
      .withWatermark("ingest_ts", watermarkDelay)
      // explode_outer: a doc shorter than k tokens has no spans but
      // still gets its verdict row (empty start set → nothing removed)
      .withColumn("sb", explode_outer(Dedup.spanIdsExpr(col("text"), k)))
      .select(col("doc_id"), col("ingest_ts"), col("text"),
        col("sb.pos").as("pos"), col("sb.s_id").as("s_id"))
      .join(dupSpans.select(col("s_id"), lit(true).as("_dx")).distinct(),
        Seq("s_id"), "left")
      .groupBy(window(col("ingest_ts"), window_), col("doc_id"),
        col("text"))
      .agg(collect_set(when(col("_dx"), col("pos"))).as("starts"))
    val words = split(col("text"), "\\s+")
    val keepw = filter(words, (_, i) =>
      !exists(col("starts"), s => s <= i && i < s + k))
    collected.select(col("doc_id"),
      size(words).cast("long").as("n_tokens"),
      (size(words) - size(keepw)).cast("long").as("n_removed"),
      round(size(keepw).cast("double") / size(words).cast("double"), 6)
        .as("keep_frac"),
      array_join(keepw, " ").as("clean_text"))
  }

  /** Streaming CDC ingest screen — the stream-static twin of
    * Dedup.cdcScreen: a FROZEN corpus chunk-hash set (persisted-index
    * shape) screens a document feed for content-defined chunks the
    * store already holds. Per-row chunking via Dedup.cdcChunksExpr
    * (pure array arithmetic — the batch builder's lag/prefix-sum
    * windows are not streamable), one stateless stream-static join,
    * one watermark-bounded per-doc rollup; verdicts spec-equal to the
    * batch cdcScreen on finalized batches. */
  def cdcScreenStream(
      docs: DataFrame, corpusChunkHashes: DataFrame,
      watermarkDelay: String,
      w: Int = Dedup.CdcW, d: Int = Dedup.CdcD,
      minTok: Int = Dedup.CdcMinTok,
      window_ : String = "1 hour"): DataFrame = {
    val isDup = coalesce(col("_cx"), lit(false)) &&
      col("c_toks") >= minTok
    docs
      .withWatermark("ingest_ts", watermarkDelay)
      .withColumn("cb", explode_outer(Dedup.cdcChunksExpr(col("text"), w, d)))
      .select(col("doc_id"), col("ingest_ts"),
        col("cb.c_toks").as("c_toks"), col("cb.c_hash").as("c_hash"))
      .join(corpusChunkHashes.select(col("c_hash"), lit(true).as("_cx"))
        .distinct(), Seq("c_hash"), "left")
      .groupBy(window(col("ingest_ts"), window_), col("doc_id"))
      .agg(sum(col("c_toks")).cast("long").as("n_tokens"),
        count(lit(1)).as("n_chunks"),
        count(when(isDup, lit(1))).as("n_dup_chunks"),
        coalesce(sum(when(isDup, col("c_toks"))), lit(0L)).cast("long")
          .as("dup_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("n_chunks"),
        col("n_dup_chunks"), col("dup_tokens"),
        round(col("dup_tokens").cast("double") /
          col("n_tokens").cast("double"), 6).as("dup_frac"))
  }

  def decontamStream(
      docs: DataFrame, evalShingles: DataFrame,
      watermarkDelay: String, n: Int = 5,
      window_ : String = "1 hour"): DataFrame =
    docs
      .withWatermark("ingest_ts", watermarkDelay)
      .withColumn("sh", explode_outer(Dedup.shingles(col("text"), n)))
      .withColumn("s_id",
        conv(substring(md5(col("sh")), 1, 15), 16, 10).cast("long"))
      .join(evalShingles.select(col("s_id"), lit(true).as("_ex")).distinct(),
        Seq("s_id"), "left")
      .groupBy(window(col("ingest_ts"), window_), col("doc_id"))
      .agg(size(collect_set(when(col("_ex"), col("s_id")))).cast("long")
        .as("n_overlap"))
      .select(col("doc_id"), col("n_overlap"),
        (col("n_overlap") === 0).as("keep"))
}
