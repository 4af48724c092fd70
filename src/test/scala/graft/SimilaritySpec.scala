package graft

import org.apache.spark.sql.functions._
import graft.similarity.Similarity

/** Vector math correctness + LSH recall vs the brute-force baseline. */
class SimilaritySpec extends SparkSpec {

  test("cosine of hand-computed vectors") {
    val df = spark.createDataFrame(Seq(
      (1L, Array(1f, 0f, 0f), Array(0f, 1f, 0f)), // orthogonal → 0
      (2L, Array(1f, 2f, 3f), Array(1f, 2f, 3f)), // identical → 1
      (3L, Array(1f, 0f, 0f), Array(-1f, 0f, 0f)) // opposite → -1
    )).toDF("id", "a", "b")
    val out = df.select(col("id"),
      round(Similarity.cosine(col("a"), col("b")), 9).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 0.0)
    assert(math.abs(out(2L) - 1.0) < 1e-9)
    assert(math.abs(out(3L) + 1.0) < 1e-9)
  }

  test("brute-force top-k on real embeddings is k rows per query, ranked") {
    val emb = Tables.embeddings(spark, sf)
    val out = Similarity.bruteForceTopK(emb.where(col("vec_id") < 5), emb, k = 3)
      .collect()
    assert(out.length == 15)
    val byQuery = out.groupBy(_.getLong(0))
    byQuery.values.foreach { rows =>
      val sims = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(sims.sameElements(sims.sortBy(-(_: Double))), "ranked desc")
    }
  }

  test("LSH top-k achieves reasonable recall vs brute force") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.where(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(queries, emb, k = 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(queries, emb, k = 5, numPlanes = 3,
        numTables = 6)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // 6 tables × 3 planes (8 buckets each) over 500 vectors: a true
    // neighbor missed by one table is usually caught by another.
    assert(recall >= 0.5, s"recall $recall too low")
    assert(approx.nonEmpty)
  }

  test("IVF top-k achieves reasonable recall and bounded cell scans") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.where(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(queries, emb, k = 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopK(queries, emb, k = 5,
        numCells = 8, nProbe = 3)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // 3 of 8 cells probed: cosine-nearest corpus vectors mostly share
    // the query's nearest centroids
    assert(recall >= 0.5, s"recall $recall too low")
    // every corpus vector lands in exactly one cell
    val cells = Similarity.ivfAssign(
      emb, Similarity.ivfCentroids(emb, 8), "vec_id", "embedding")
    assert(cells.count() == emb.count())
    assert(cells.select("cell_id").distinct().count() <= 8)
  }

  test("int8 quantization: planted vector exact, error bounded by scale/2") {
    // [127, -63.5, 0.25]: scale = 1.0, snapped = [127, -64 (rounds
    // half away from zero), 0] → max error = 0.5 at the -63.5 element
    val planted = spark.createDataFrame(
      Seq((1L, Seq(127.0f, -63.5f, 0.25f), 0)))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.quantizeInt8Stats(planted).collect()(0)
    assert(r.getAs[Double]("avg_scale") == 1.0)
    assert(r.getAs[Double]("avg_maxerr") == 0.5)
    // real corpus: rounding error can never exceed half a quantization
    // step, and clamping never triggers (|q| <= 127 by construction)
    val emb = Tables.embeddings(spark, sf)
    val stats = Similarity.quantizeInt8Stats(emb)
    val bad = stats.where(col("avg_maxerr") > col("avg_scale") / 2.0 + 1e-9)
      .count()
    assert(bad == 0, "reconstruction error above scale/2 bound")
  }
}
