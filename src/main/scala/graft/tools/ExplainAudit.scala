package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for the headline queries so
  * the shuffle/broadcast/pushdown shape can be audited by eye.
  * `sbt "runMain graft.tools.ExplainAudit q_tpch5 q_tpch3"` (no args =
  * the standard audit set). */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_tpch3", "q_tpch5", "q_tpch6", "q_tpch10",
        "q_dedup_ngram_jaccard", "q_ann_bruteforce", "q_win_cumsum",
        "q_events_tumbling")
    val sf = "/root/testdata/sf0.001"
    names.foreach { n =>
      println(s"\n========== $n ==========")
      graft.SparkEntry.queries(n)(spark, sf).explain("formatted")
    }
    spark.stop()
  }
}
