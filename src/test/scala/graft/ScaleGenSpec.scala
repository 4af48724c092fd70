package graft

import org.apache.spark.sql.functions._
import graft.tools.ScaleGen

/** The scaling-curve dataset generator must preserve what the
  * measurement depends on: schema identity, referential integrity per
  * copy, cross-copy key disjointness, and cross-copy CONTENT
  * disjointness for similarity-bearing columns (texts, embeddings). */
class ScaleGenSpec extends SparkSpec {

  private val factor = 3

  test("replicate: schema identical, row count scales by the factor") {
    Tables.all.foreach { t =>
      val base =
        if (t == "events") Tables.events(spark, sf) else Tables.load(spark, sf, t)
      val rep = ScaleGen.replicate(spark, sf, t, factor)
      assert(rep.schema == base.schema, s"$t schema drifted")
      assert(rep.count() == factor * base.count(), s"$t count not x$factor")
    }
  }

  test("replicate: referential integrity holds inside every copy") {
    val orders = ScaleGen.replicate(spark, sf, "orders", factor)
    val customer = ScaleGen.replicate(spark, sf, "customer", factor)
    val lineitem = ScaleGen.replicate(spark, sf, "lineitem", factor)
    val nation = ScaleGen.replicate(spark, sf, "nation", factor)
    assert(orders.join(customer,
      orders("o_custkey") === customer("c_custkey"), "left_anti").count() == 0,
      "orphan o_custkey")
    assert(lineitem.join(orders,
      lineitem("l_orderkey") === orders("o_orderkey"), "left_anti").count() == 0,
      "orphan l_orderkey")
    assert(customer.join(nation,
      customer("c_nationkey") === nation("n_nationkey"), "left_anti").count() == 0,
      "orphan c_nationkey")
  }

  test("replicate: keys disjoint across copies, offset by copy index") {
    val docs = ScaleGen.replicate(spark, sf, "documents", factor)
    val perCopy = docs
      .groupBy((col("doc_id") / ScaleGen.Off).cast("int").as("k"))
      .agg(countDistinct(col("doc_id")).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val baseN = Tables.documents(spark, sf).count()
    assert(perCopy.keySet == (0 until factor).toSet, perCopy)
    assert(perCopy.values.forall(_ == baseN), perCopy)
  }

  test("replicate: document tokens are salted disjoint across copies") {
    val docs = ScaleGen.replicate(spark, sf, "documents", factor)
    val toks = docs
      .select((col("doc_id") / ScaleGen.Off).cast("int").as("k"),
        explode(split(col("text"), "\\s+")).as("tok"))
      .where(col("tok") =!= "")
    // a token string appearing in two copies would collapse LSH buckets
    val shared = toks.groupBy(col("tok"))
      .agg(countDistinct(col("k")).as("nk"))
      .where(col("nk") > 1).count()
    assert(shared == 0, s"$shared tokens shared across copies")
    // n_chars stays consistent with the salted text
    val bad = docs.where(length(col("text")) =!= col("n_chars")).count()
    assert(bad == 0, s"$bad rows with stale n_chars")
  }

  test("replicate: embedding rotation preserves norms, decorrelates copies") {
    val emb = ScaleGen.replicate(spark, sf, "embeddings", factor)
    val base = Tables.embeddings(spark, sf)
    val norm = expr("round(aggregate(embedding, 0D, (a, x) -> a + CAST(x AS DOUBLE) * x), 4)")
    // multiset of norms is factor copies of the base multiset
    val repNorms = emb.select(norm.as("n2")).groupBy("n2").count()
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    val baseNorms = base.select(norm.as("n2")).groupBy("n2").count()
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(repNorms == baseNorms.map { case (k, v) => k -> v * factor },
      "rotation changed vector norms")
    // copies 1.. are genuinely rotated: same vec_id mod offset, different
    // first component (unless the rotation maps it onto itself)
    val c0 = base.select(col("vec_id"),
      element_at(col("embedding"), 1).as("x0"))
    val c1 = emb.where(col("vec_id") >= ScaleGen.Off &&
        col("vec_id") < 2 * ScaleGen.Off)
      .select((col("vec_id") - ScaleGen.Off).as("vec_id"),
        element_at(col("embedding"), 1).as("x1"))
    val differing = c0.join(c1, "vec_id")
      .where(col("x0") =!= col("x1")).count()
    assert(differing > 0, "copy 1 embeddings identical to copy 0")
  }
}
