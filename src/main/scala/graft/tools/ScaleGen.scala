package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Derive an N× dataset from an existing SF dir by KEY-OFFSET UNION —
  * the round-12 scaling-curve generator (VERDICT r11 item 1: measure
  * wall-time growth instead of arguing plan shapes).
  *
  * Copy 0 is the source verbatim; copy k offsets every join/identity
  * key by k·10⁷ (all source keys < 1.5·10⁵ at sf0.1; the offset stays
  * int32-safe for the nation/region key columns), so each copy is a
  * self-contained referentially-intact universe and the per-copy
  * workload is identical to the source. Content columns that drive
  * SIMILARITY work are additionally salted per copy — document tokens
  * get a per-copy suffix and embedding vectors rotate dimensions — so
  * cross-copy near-dup/ANN structure does NOT collapse into 10×-sized
  * clusters (byte-identical texts in every copy would make every LSH
  * bucket 10× deeper and the pair stage 100× heavier for DATA-SHAPE
  * reasons, poisoning the plan-scaling measurement this dataset
  * exists for).
  *
  * Usage: runMain graft.tools.ScaleGen <srcDir> <outDir> <factor>
  */
object ScaleGen {

  /** Per-copy key offset; > any source key, int32-safe through k=200. */
  val Off = 10000000L

  /** Join/identity key columns per table (content columns untouched). */
  private val keyCols: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey"),
    "nation" -> Seq("n_nationkey", "n_regionkey"),
    "customer" -> Seq("c_custkey", "c_nationkey"),
    "supplier" -> Seq("s_suppkey", "s_nationkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  /** One shifted copy: keys offset (original physical type preserved so
    * the union's schema equals the source's), content salted. */
  def copyK(name: String, df: DataFrame, k: Int): DataFrame = {
    if (k == 0) return df
    val off = Off * k
    val keyed = keyCols(name).foldLeft(df) { (d, c) =>
      d.withColumn(c, (col(c) + lit(off)).cast(df.schema(c).dataType))
    }
    name match {
      case "documents" =>
        // every token gets a copy suffix: shingle/minhash/ngram sets are
        // DISJOINT across copies while each copy's internal near-dup
        // structure is untouched (same token counts, same dup pairs)
        keyed
          .withColumn("text",
            regexp_replace(col("text"), "(\\S+)", "$1x" + k))
          .withColumn("n_chars", length(col("text")).cast("long"))
      case "embeddings" =>
        // rotate dimensions by k: norms and within-copy distances are
        // preserved exactly; across copies vectors decorrelate, so LSH/
        // IVF cells don't stack 10 identical points per cell
        val d = 64
        val r = k % d
        if (r == 0) keyed
        else keyed.withColumn("embedding",
          concat(slice(col("embedding"), r + 1, d - r),
            slice(col("embedding"), 1, r)))
      case _ => keyed
    }
  }

  def replicate(s: SparkSession, src: String, name: String, factor: Int): DataFrame = {
    val base =
      if (name == "events") Tables.events(s, src) else Tables.load(s, src, name)
    (0 until factor).map(copyK(name, base, _)).reduce(_.unionByName(_))
  }

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val factor = args(2).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.all.foreach { t =>
      replicate(spark, src, t, factor)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scalegen] wrote $out/$t.parquet x$factor")
    }
    spark.stop()
  }
}
