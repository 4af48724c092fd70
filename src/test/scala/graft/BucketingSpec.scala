package graft

import org.apache.spark.sql.functions._
import graft.sources.Bucketing

/** Bucketed joins must not shuffle: the write-time hash partitioning
  * replaces the per-query Exchange. */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables has no shuffle exchange") {
    // broadcast would bypass the point — force the sort-merge path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(
        Tables.orders(spark, sf), "b_orders", "o_custkey", 8,
        sortCols = Seq("o_custkey"))
      Bucketing.writeBucketed(
        Tables.customer(spark, sf), "b_customer", "c_custkey", 8,
        sortCols = Seq("c_custkey"))
      val joined = Bucketing.bucketedJoin(
        spark, "b_orders", "b_customer", "o_custkey", "c_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      // and it still returns the right rows
      assert(joined.count() ==
        Tables.orders(spark, sf).join(
          Tables.customer(spark, sf),
          col("o_custkey") === col("c_custkey")).count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("aggregation on the bucket key avoids the shuffle too") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(
        Tables.orders(spark, sf), "b_orders2", "o_custkey", 8)
      val agg = spark.table("b_orders2")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed aggregation should not shuffle:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders2")
    }
  }
}
