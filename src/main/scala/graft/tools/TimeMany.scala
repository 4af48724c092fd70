package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev helper: time a LIST of registered queries in one warmed session
  * (Bench's exact methodology — settle + min-of-3 + noop sink) and
  * print one `name seconds` line each. For A/B comparisons of a code
  * change without paying a full 280-query Bench sweep per side:
  *   sbt "runMain graft.tools.TimeMany q_a,q_b /root/testdata/sf0.1" */
object TimeMany {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sf = args(1)
    // same warmup as Bench: full registry plan + a few small executions
    graft.SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    Seq("q_dedup_exact", "q_win_rows", "q_events_sessionize", "q_inner_join")
      .foreach { q =>
        graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
          .write.format("noop").mode("overwrite").save()
      }
    def settle(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
      System.gc()
    }
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      val times = (1 to 3).map { _ =>
        settle()
        val t0 = System.nanoTime()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[timemany] $n ${times.min}%.3f")
    }
    spark.stop()
  }
}
