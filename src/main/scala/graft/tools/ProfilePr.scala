package graft.tools

import org.apache.spark.sql.SparkSession
import graft.Tables
import graft.queries.Graph

/** Dev tool: time q_graph_pagerank shapes end-to-end, exactly as the
  * bench sees them. Calls the real query functions (no re-typed
  * constants — the timings measure the same computation the driver
  * runs) and mirrors the bench harness parallelism. */
object ProfilePr {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
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
    def run(name: String, q: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      for (p <- 1 to 2)
        time(s"$name pass $p")(
          q(spark, d).write.format("noop").mode("overwrite").save())
    run("checkpointed", (s, dir) => Graph.qGraphPagerank(s, dir))
    run("one-job", (s, dir) => Graph.qGraphPagerankOneJob(s, dir))
    spark.stop()
  }
}
