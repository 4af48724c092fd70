package graft.tools

import org.apache.spark.sql.SparkSession
import graft.sources.Bucketing
import graft.Tables

/** Dev tool: drive the bucketed-join path end-to-end and print whether
  * the join plan is Exchange-free. */
object BucketDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    Bucketing.writeBucketed(Tables.orders(spark, sf), "bo", "o_custkey", 4)
    Bucketing.writeBucketed(Tables.customer(spark, sf), "bc", "c_custkey", 4)
    val j = Bucketing.bucketedJoin(spark, "bo", "bc", "o_custkey", "c_custkey")
    val p = j.queryExecution.executedPlan.toString
    println("rows=" + j.count())
    println(if (p.contains("SortMergeJoin") && !p.contains("Exchange"))
      "NOEXCHANGE-OK" else "PLAN-BAD:\n" + p)
    spark.sql("DROP TABLE bo")
    spark.sql("DROP TABLE bc")
    spark.stop()
  }
}
