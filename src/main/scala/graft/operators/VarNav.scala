package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Navigation functions with PER-ROW offsets — reference parity.
  *
  * The reference's `lead`/`lag` take callables for the offset
  * (/root/reference/stupidb/api.py:842 `lead(x, n, default)` where `n`
  * computes the shift from the current row). Spark's `lead()/lag()`
  * require a foldable offset, so the variable form is expressed
  * relationally: number the rows per partition, then left-join
  * `rn + offset(row)` back against `rn` within the partition. One
  * extra shuffle on the partition key; everything codegen'd.
  */
object VarNav {

  /** Append `out` = value of `valueCol` at the row `offset` rows ahead
    * (negative offset = behind) in the (partitionCols, orderCols)
    * ordering; NULL (or `default`) when the target falls outside the
    * partition. */
  def varLead(
      df: DataFrame,
      partitionCols: Seq[String],
      orderCols: Seq[Column],
      valueCol: Column,
      offset: Column,
      out: String,
      default: Option[Column] = None): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(orderCols: _*)
    val withRn = df.withColumn("_rn", row_number().over(w))
    val right = withRn.select(
      partitionCols.map(c => col(c).as(s"_r_$c")) :+
        col("_rn").as("_rn_r") :+ valueCol.as("_v_r"): _*)
    val joinCond = partitionCols
      .map(c => col(c) === col(s"_r_$c"))
      .foldLeft(col("_tgt") === col("_rn_r"))(_ && _)
    val joined = withRn
      .withColumn("_tgt", col("_rn") + offset.cast("int"))
      .join(right, joinCond, "left_outer")
    val value = default match {
      case Some(d) => coalesce(col("_v_r"), d)
      case None => col("_v_r")
    }
    joined
      .withColumn(out, value)
      .drop("_rn", "_tgt", "_rn_r", "_v_r")
      .drop(partitionCols.map(c => s"_r_$c"): _*)
  }

  /** `varLead` with the offset negated — per-row lag. */
  def varLag(
      df: DataFrame,
      partitionCols: Seq[String],
      orderCols: Seq[Column],
      valueCol: Column,
      offset: Column,
      out: String,
      default: Option[Column] = None): DataFrame =
    varLead(df, partitionCols, orderCols, valueCol, -offset, out, default)
}
