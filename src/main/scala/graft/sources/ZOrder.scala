package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for multi-dimensional scan
  * pruning.
  *
  * Sorting a table on one key makes parquet min/max row-group pruning
  * work for that key only; a predicate on any other column still scans
  * everything. Interleaving the bits of several keys into one Morton
  * value and sorting on THAT gives every output file a tight
  * hyper-rectangle in ALL interleaved dimensions, so range predicates
  * on any of them prune files — the standard layout lever for 100 TB
  * fact tables queried along more than one axis. The shuffle is paid
  * once per layout rewrite, amortized over every later scan.
  *
  * The reference has no storage layer at all (in-memory rows only,
  * /root/reference/stupidb/api.py `table()`), so this is pure
  * Spark-side value-add, like Bucketing.
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of each column into one
    * long. Column c's bit b lands at position `b*n + (n-1-c)`, i.e.
    * lanes round-robin LSB-first with column 0 most significant inside
    * each lane group. Pure builtin shift/mask arithmetic — the whole
    * expression stays inside whole-stage codegen, no UDF. Values are
    * expected non-negative and below 2^bits; higher bits are simply
    * not interleaved. CALLERS MUST SCALE each column to use the FULL
    * [0, 2^bits) range (e.g. `shiftleft` a narrow-domain key): a
    * column whose domain fills only the low bits contributes nothing
    * to the curve's top levels, and the layout degenerates to a
    * lead-key sort on the wider columns. */
  def zorderValue(cols: Seq[Column], bits: Int): Column = {
    val n = cols.length
    require(n >= 2, "z-order needs at least two columns")
    require(bits >= 1 && bits * n <= 62,
      s"$bits bits x $n cols must fit a long")
    val terms = for {
      b <- 0 until bits
      c <- 0 until n
    } yield shiftleft(
      shiftright(cols(c).cast("long"), b).bitwiseAND(lit(1L)),
      b * n + (n - 1 - c))
    terms.reduce(_ bitwiseOR _)
  }

  /** Scale `c` from its [minV, maxV] domain onto the full [0, 2^bits)
    * budget — the rank-normalization every real z-order writer applies
    * before interleaving, because a column whose raw domain fills only
    * the low bits contributes nothing at the curve's top. Pure IEEE
    * double multiply/divide + floor, bit-identical in any engine; a
    * degenerate single-value domain maps to 0. */
  def normalize(c: Column, minV: Column, maxV: Column, bits: Int): Column =
    when(maxV === minV, lit(0L)).otherwise(
      floor((c - minV).cast("double") * lit(((1L << bits) - 1).toDouble)
        / (maxV - minV).cast("double")))

  /** DuckDB-dialect twin of [[normalize]], same operation order. */
  def normalizeSql(c: String, minV: String, maxV: String,
                   bits: Int): String = {
    val top = ((1L << bits) - 1).toDouble
    s"CASE WHEN $maxV = $minV THEN 0 ELSE " +
      s"CAST(FLOOR(CAST($c - $minV AS DOUBLE) * $top " +
      s"/ CAST($maxV - $minV AS DOUBLE)) AS BIGINT) END"
  }

  /** The same interleave as DuckDB-dialect SQL, generated from the
    * same loop so an oracle runs literally identical arithmetic. */
  def zorderSql(cols: Seq[String], bits: Int): String = {
    val n = cols.length
    val terms = for {
      b <- 0 until bits
      c <- 0 until n
    } yield s"((((${cols(c)} >> $b) & 1)) << ${b * n + (n - 1 - c)})"
    terms.mkString("(", " | ", ")")
  }

  /** Rewrite `df` into z-order: range-partition on the Morton value,
    * then sort within partitions, so row groups inside each file are
    * tight too. `nPartitions` output partitions ≈ output files; size
    * it so each lands near the row-group/file size target. */
  def layout(df: DataFrame, zcols: Seq[Column], bits: Int,
             nPartitions: Int): DataFrame = {
    val z = zorderValue(zcols, bits)
    df.withColumn("__z", z)
      .repartitionByRange(nPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
