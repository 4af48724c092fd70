package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.dedup.Dedup

/** Dev tool: time the stages of the relational dedup pipelines. */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  (rows=$n)")
    }
    val docs = Tables.documents(spark, d)
      .repartition(spark.sparkContext.defaultParallelism)
    time("warmup count")(docs.count())
    time("token rows")(Dedup.tokenRows(docs, "doc_id", "text").count())
    time("shingle rows")(
      Dedup.shingleRows(docs, "doc_id", "text", Nil, 3).count())
    time("minhash sig table")(
      Dedup.minhashSigTable(
        Dedup.minhashShingleRows(docs, "doc_id", "text", 3)).count())
    time("full minhash")(
      Dedup.minhashDedup(docs, "doc_id", "text", 3, 0.3).count())
    time("full jaccard")(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        Seq("lang", "source"), 3, 0.3).count())
    time("simhash table")(
      Dedup.simhashTable(Dedup.tokenRowsPortable(docs, "doc_id", "text")).count())
    time("full simhash pairs")(
      Dedup.simhashPairs(docs, "doc_id", "text", 8).count())
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      Seq("lang", "source"), 3, 0.3)
    time("jaccard pairs (again)")(pairs.count())
    time("cc over pairs")(
      graft.dedup.Cluster.connectedComponents(pairs, "id_a", "id_b").count())
    spark.stop()
  }
}
