package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Dev tool: time the stages of q_graph_pagerank. */
object ProfilePr {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    time("warmup")(Tables.lineitem(spark, d).count())
    // stage timings mirroring PageRank.pagerank
    val edges = Tables.lineitem(spark, d)
      .select(col("l_partkey").as("part"),
        (col("l_suppkey") + 10000000L).as("supp"))
      .repartition(spark.sparkContext.defaultParallelism)
    val sym = edges
      .select(explode(array(
        struct(col("part").as("src"), col("supp").as("dst")),
        struct(col("supp").as("src"), col("part").as("dst")))).as("ed"))
      .select(col("ed.src").as("src"), col("ed.dst").as("dst"))
      .repartition(col("src"))
      .dropDuplicates("src", "dst")
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("sdeg"))
    val e = time("edge build + checkpoint") {
      val x = sym.join(deg, "src").localCheckpoint()
      x
    }
    val n = time("count distinct")(
      e.agg(countDistinct(col("src"))).collect()(0).getLong(0))
    println(s"n=$n edges=${e.count()}")
    val nodes = e.groupBy(col("src")).agg(first(col("sdeg")).as("deg"))
      .select(col("src").as("node"), col("deg"))
    def snap(c: org.apache.spark.sql.Column) = round(c, 12).cast("decimal(28,12)")
    var ranks = nodes.select(col("node"), snap(lit(1.0) / lit(n.toDouble)).as("r"))
    for (i <- 1 to 3) {
      val prev = ranks
      ranks = e
        .join(prev.select(col("node").as("src"), col("r")), "src")
        .select(col("dst").as("node"),
          snap(col("r").cast("double") / col("sdeg")).as("c"))
        .groupBy(col("node"))
        .agg(snap(lit(1.0 - 0.85) / lit(n.toDouble) +
          lit(0.85) * sum(col("c")).cast("double")).as("r"))
      time(s"iter $i (cumulative)")(ranks.write.format("noop").mode("overwrite").save())
    }
    val fin = ranks.join(nodes, "node")
      .select(col("node"), col("deg"), round(col("r").cast("double"), 8).as("rank"))
      .orderBy(col("node"))
    time("final join+sort")(fin.write.format("noop").mode("overwrite").save())
    // the full query, twice, as the bench sees it
    for (p <- 1 to 2)
      time(s"full query pass $p")(
        graft.queries.Graph.qGraphPagerank(spark, d)
          .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
