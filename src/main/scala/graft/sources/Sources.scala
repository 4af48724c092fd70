package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Columnar/text sources and sinks (SURVEY.md §2 infrastructure).
  *
  * The reference engine's only ingress is an in-memory iterable
  * (/root/reference/stupidb/api.py:104 `table`); graft reads and
  * writes real formats. Defaults are the scale-sane ones: snappy
  * parquet, schema inferred only when asked (inference is a full
  * extra scan at 100 TB), and partitioned writes for downstream
  * partition pruning.
  */
object Sources {

  /** In-memory rows → DataFrame: the reference's `table()` verb. */
  def table(spark: SparkSession, rows: Seq[Map[String, Any]]): DataFrame = {
    import scala.jdk.CollectionConverters._
    require(rows.nonEmpty, "table() needs at least one row to infer a schema")
    val cols = rows.head.keys.toSeq.sorted
    val data = rows.map(r => org.apache.spark.sql.Row.fromSeq(cols.map(r(_))))
    val fields = cols.map { c =>
      val v = rows.head(c)
      val dt = v match {
        case _: Int => org.apache.spark.sql.types.IntegerType
        case _: Long => org.apache.spark.sql.types.LongType
        case _: Double => org.apache.spark.sql.types.DoubleType
        case _: Boolean => org.apache.spark.sql.types.BooleanType
        case _ => org.apache.spark.sql.types.StringType
      }
      org.apache.spark.sql.types.StructField(c, dt, nullable = true)
    }
    spark.createDataFrame(
      data.asJava, org.apache.spark.sql.types.StructType(fields))
  }

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readCsv(spark: SparkSession, path: String,
      header: Boolean = true, inferSchema: Boolean = false): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("inferSchema", inferSchema.toString)
      .csv(path)

  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** Parquet write, optionally hive-partitioned by low-cardinality
    * columns so downstream readers prune partitions at the source. */
  def writeParquet(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path)
  }

  /** Size-targeted parquet write — the small-files answer at 100 TB.
    * A naive partitioned write flushes one file per task per hive
    * partition (shuffle.partitions × |partitions| tiny files — the
    * classic metastore/namenode killer), while `coalesce(1)`
    * serializes the whole write through one task. Instead: estimate
    * the output from the optimized plan's stats, split it into
    * ~`targetBytes` chunks, and repartition to exactly that many
    * write tasks. With `sortBy`, range-partition + sort within each
    * file so parquet row-group min/max stays prunable downstream
    * (the lightweight cousin of sources.ZOrder for one sort axis).
    * Returns the file-count decision so callers (and the spec) can
    * audit it. Stats overestimate vs. encoded parquet (in-memory row
    * widths, no encoding) — acceptable: erring toward more files
    * keeps tasks parallel, and the count is still data-proportional. */
  def writeParquetSized(df: DataFrame, path: String,
      targetBytes: Long = 128L << 20,
      sortBy: Seq[String] = Nil,
      partitionBy: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Int = {
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val nFiles = ((bytes + targetBytes - 1) / targetBytes)
      .max(BigInt(1)).min(BigInt(1 << 20)).toInt
    // with hive partitioning, a hash repartition would spread every
    // hive partition across every task — one file per (task,
    // partition), the explosion this sink exists to prevent. Range-
    // cluster on the partition columns (then sort keys) instead: each
    // task holds a contiguous (partition, key) slice, so a task
    // writes into at most two adjacent hive partitions while hot
    // partitions still split across tasks for size.
    val clusterCols = (partitionBy ++ sortBy)
      .map(org.apache.spark.sql.functions.col)
    val shaped =
      if (clusterCols.nonEmpty)
        df.repartitionByRange(nFiles, clusterCols: _*)
          .sortWithinPartitions(clusterCols: _*)
      else df.repartition(nFiles)
    val w = shaped.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path)
    nFiles
  }

  def writeCsv(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  /** ORC — the other predicate-pushdown columnar format; same
    * partitioned-write contract as parquet. */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .orc(path)
  }
}
