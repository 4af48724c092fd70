package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed tables for shuffle-free co-located joins (SURVEY.md §4).
  *
  * A fact-fact join at 100 TB shuffles both sides on the join key every
  * time it runs. Bucketing pays that shuffle ONCE at write time: both
  * tables are hash-partitioned into the same number of buckets on the
  * join key, so every subsequent join (and aggregation on the key)
  * reads matching buckets directly — `SortMergeJoin` with no Exchange,
  * verified in BucketingSpec.
  */
object Bucketing {

  /** Write `df` as a bucketed (and optionally sorted) managed table. */
  def writeBucketed(
      df: DataFrame, table: String, bucketCol: String, numBuckets: Int,
      sortCols: Seq[String] = Nil): Unit =
    writeBucketedOn(df, table, Seq(bucketCol), numBuckets, sortCols)

  /** Composite-key variant: bucket on several columns. A later join
    * elides the bucketed side's shuffle when its equi-join keys cover
    * ALL the bucket columns. */
  def writeBucketedOn(
      df: DataFrame, table: String, bucketCols: Seq[String], numBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    val w = df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket keys — no shuffle when
    * bucket counts match. */
  def bucketedJoin(
      spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
