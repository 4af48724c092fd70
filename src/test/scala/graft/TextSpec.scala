package graft

import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** Hand-computed expectations for the text operators. */
class TextSpec extends SparkSpec {

  private def one(text: String) =
    spark.createDataFrame(Seq((1L, text))).toDF("id", "text")

  test("token and char counts") {
    val r = one("the quick brown fox").select(
      TextAnalysis.tokenCount(col("text")).as("t"),
      TextAnalysis.charCount(col("text")).as("c")).collect()(0)
    assert(r.getInt(0) == 4 && r.getInt(1) == 19)
  }

  test("stopword ratio counts exact matches only") {
    val r = one("the cat in the hat").select(
      TextAnalysis.stopwordRatio(col("text")).as("r")).collect()(0)
    assert(r.getDouble(0) == 3.0 / 5.0) // the, in, the
  }

  test("fingerprint normalizes case and whitespace") {
    val df = spark.createDataFrame(Seq(
      (1L, "Hello   World"), (2L, "hello world"), (3L, "different")
    )).toDF("id", "text")
    val fps = df.select(col("id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("langid picks the dominant marker language; und when none") {
    val langs = Seq("en", "es", "de", "fr", "zh")
    val df = spark.createDataFrame(Seq(
      (1L, "the cat and the dog of war"),
      (2L, "el gato con la bota los dias"),
      (3L, "xyzzy qwerty asdf")
    )).toDF("id", "text")
    val withHits = langs.foldLeft(df) { case (acc, l) =>
      acc.withColumn(s"h_$l", TextAnalysis.markerHits(col("text"), l))
    }
    val out = withHits.select(col("id"),
      TextAnalysis.langId(langs.map(l => l -> col(s"h_$l")).toMap).as("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "es")
    assert(out(3L) == "und")
  }

  test("approx sketches track exact values (the 100 TB swap-ins)") {
    val docs = Tables.documents(spark, sf)
    val r = docs.select(
      expr("percentile(n_chars, 0.5)").as("exact_p50"),
      expr("approx_percentile(n_chars, 0.5, 10000)").as("approx_p50"),
      countDistinct(col("source")).as("exact_nd"),
      approx_count_distinct(col("source")).as("approx_nd")).collect()(0)
    assert(math.abs(r.getDouble(0) - r.getAs[Number](1).doubleValue())
      <= math.max(1.0, r.getDouble(0) * 0.02))
    assert(math.abs(r.getLong(2) - r.getLong(3)) <= math.max(1L, r.getLong(2) / 20))
  }

  test("quality score is bounded in [0,1]") {
    val r = one("the a of in and " * 20).select(
      TextAnalysis.qualityScore(col("text")).as("q")).collect()(0).getDouble(0)
    assert(r >= 0.0 && r <= 1.0)
  }

  test("repetition fractions: planted all-duplicate doc and corpus bounds") {
    // "a a a a": 1 distinct of 4 tokens → dup 0.75; the only bigram
    // and trigram are themselves the top ones → both fractions 1.0
    val rep = graft.queries.Text.qTextRepetition(spark, sf)
      .select(col("doc_id"), col("dup_tok_frac"),
        col("top_bigram_frac"), col("top_trigram_frac"))
    val bad = rep.where(
      col("dup_tok_frac") < 0.0 || col("dup_tok_frac") > 1.0 ||
      col("top_bigram_frac") < 0.0 || col("top_bigram_frac") > 1.0 ||
      col("top_trigram_frac") < 0.0 || col("top_trigram_frac") > 1.0).count()
    assert(bad == 0, "repetition fraction outside [0,1]")
    // planted all-duplicate doc through the same backbone formulas
    val toks = spark.createDataFrame(Seq((1L, "a a a a"))).toDF("doc_id", "text")
      .select(col("doc_id"),
        posexplode(split(lower(col("text")), "\\s+")).as(Seq("pos", "tok")))
    val counts = toks.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), countDistinct(col("tok")).as("d"))
      .collect()(0)
    assert(counts.getLong(1) == 4L && counts.getLong(2) == 1L)
  }

  test("scrub removes every pattern match and counts them") {
    val out = graft.queries.Text.qTextScrub(spark, sf)
    val leftover = out.where(col("scrubbed").rlike("\\b(customer|order)\\b")).count()
    assert(leftover == 0, "pattern survived scrubbing")
    val agg = out.agg(sum(col("n_redacted")).as("n")).collect()(0).getLong(0)
    assert(agg > 0, "scrub found no matches — pattern dead against corpus")
  }

  test("perplexity is >= 1 and tracks token rarity") {
    val p = graft.queries.Text.qTextPerplexity(spark, sf)
    assert(p.where(col("ppl") < 1.0 || col("avg_logp") >= 0.0).count() == 0,
      "perplexity below 1 or non-negative mean log-prob")
    // every doc's ppl is bounded above by the rarest token's inverse
    // probability — sanity-check against the corpus vocabulary size
    val vocab = graft.Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), "\\s+")).as("t"))
      .distinct().count()
    assert(p.agg(max(col("ppl"))).collect()(0).getDouble(0) < vocab * 100.0)
  }

  test("bm25 ranks by rounded score descending with doc_id tiebreak") {
    val rows = graft.queries.Text.qTextBm25(spark, sf)
      .select(col("doc_id"), col("bm25")).collect()
    assert(rows.length == 50)
    rows.sliding(2).foreach { case Array(a, b) =>
      val (sa, sb) = (a.getDouble(1), b.getDouble(1))
      assert(sa > sb || (sa == sb && a.getLong(0) < b.getLong(0)),
        s"ordering violated: $a then $b")
    }
  }
}
