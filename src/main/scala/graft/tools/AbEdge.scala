package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Dev harness (round 14): interleaved A/B of the co-purchase edge
  * builds — r13 self-join vs r14 array rollup — through the LPA
  * consumer (the family member that regressed in isolated timing),
  * plus the bare edge build, in ONE warmed session. */
object AbEdge {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"

    def edgesOld: DataFrame = {
      val items = Tables.lineitem(spark, d)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
        .repartition(spark.sparkContext.defaultParallelism)
      items.as("a").join(items.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
        .distinct()
    }
    def edgesNew: DataFrame =
      graft.operators.BasketPairs.pairRows(
        Tables.lineitem(spark, d), "l_orderkey", "l_partkey").distinct()

    def lpa(edges: DataFrame): DataFrame = {
      val e = edges.select(col("pa").as("src"), col("pb").as("dst"))
        .unionByName(edges.select(col("pb").as("src"), col("pa").as("dst")))
        .localCheckpoint()
      var lab = e.select(col("src").as("node")).distinct()
        .select(col("node"), col("node").as("label"))
      for (_ <- 1 to 4) {
        val counts = e
          .join(lab.select(col("node").as("dst"), col("label")), "dst")
          .groupBy(col("src"), col("label"))
          .agg(count(lit(1)).as("cnt"))
        lab = counts.groupBy(col("src"))
          .agg(min(struct((-col("cnt")).as("nc"), col("label").as("l")))
            .as("w"))
          .select(col("src").as("node"), col("w.l").as("label"))
          .localCheckpoint()
      }
      lab
    }

    def run(df: => DataFrame): Double = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def eOf(edges: DataFrame) = edges
      .select(col("pa").as("src"), col("pb").as("dst"))
      .unionByName(edges.select(col("pb").as("src"), col("pa").as("dst")))
      .localCheckpoint()
    println(s"[ab] e_parts old=${eOf(edgesOld).rdd.getNumPartitions} " +
      s"new=${eOf(edgesNew).rdd.getNumPartitions}")
    println(s"[ab] e_stats old=" +
      eOf(edgesOld).queryExecution.optimizedPlan.stats.sizeInBytes +
      " new=" + eOf(edgesNew).queryExecution.optimizedPlan.stats.sizeInBytes)
    println(s"[ab] edges_stats old=" +
      edgesOld.queryExecution.optimizedPlan.stats.sizeInBytes +
      " new=" + edgesNew.queryExecution.optimizedPlan.stats.sizeInBytes)
    run(edgesOld); run(edgesNew) // warm
    def phase(edges: DataFrame): (Double, Double) = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      val e = eOf(edges) // eager checkpoint job
      val t1 = System.nanoTime()
      var lab = e.select(col("src").as("node")).distinct()
        .select(col("node"), col("node").as("label"))
      for (_ <- 1 to 4) {
        val counts = e
          .join(lab.select(col("node").as("dst"), col("label")), "dst")
          .groupBy(col("src"), col("label"))
          .agg(count(lit(1)).as("cnt"))
        lab = counts.groupBy(col("src"))
          .agg(min(struct((-col("cnt")).as("nc"), col("label").as("l")))
            .as("w"))
          .select(col("src").as("node"), col("w.l").as("label"))
          .localCheckpoint()
      }
      lab.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
    }
    (1 to 3).foreach { i =>
      val (oc, or) = phase(edgesOld)
      val (nc, nr) = phase(edgesNew)
      println(f"[ab] phase$i ckpt old=$oc%.2f new=$nc%.2f | " +
        f"rounds old=$or%.2f new=$nr%.2f")
    }
    Seq[(String, () => DataFrame, () => DataFrame)](
      ("edges_only", () => edgesOld, () => edgesNew),
      ("lpa_full", () => lpa(edgesOld), () => lpa(edgesNew))
    ).foreach { case (name, a, b) =>
      val as = (1 to 3).map(_ => run(a()))
      val bs = (1 to 3).map(_ => run(b()))
      println(f"[ab] $name old=${as.min}%.3f new=${bs.min}%.3f " +
        f"ratio=${bs.min / as.min}%.2f")
    }
    spark.stop()
  }
}
