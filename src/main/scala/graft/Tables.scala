package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the driver-generated test tables (TESTDATA.md).
  *
  * The reference engine only supports in-memory relations built from Python
  * mappings (/root/reference/stupidb/api.py:104 `table()`); graft reads real
  * columnar sources. Parquet scans in Spark get predicate pushdown + column
  * pruning for free, which is the 100 TB posture: a filter+projection query
  * reads only the needed row groups and columns.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` has shipped as two physical types across testdata
    * generations: INT64 TIMESTAMP(NANOS) (Spark 4 refuses to read it
    * natively — read nanos as long and truncate to microseconds with
    * integer division, matching DuckDB's ns→µs cast) and plain
    * TIMESTAMP(MICROS) without UTC adjustment (Spark reads it as
    * TIMESTAMP_NTZ). Normalize both to TimestampType so every
    * downstream window/range/stream sees one type; all entrypoints run
    * with spark.sql.session.timeZone=UTC, so the NTZ→TZ cast preserves
    * the wall-clock values DuckDB reads from the same file. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
