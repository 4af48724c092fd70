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
    // A managed table's warehouse directory outlives the in-memory
    // catalog across JVMs: a fresh session sees no table but
    // saveAsTable still refuses the stale location
    // (LOCATION_ALREADY_EXISTS). Overwrite semantics here mean the
    // orphaned directory is dead weight — clear it.
    val spark = df.sparkSession
    if (!spark.catalog.tableExists(table)) {
      val wh = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"))
      val loc = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
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
