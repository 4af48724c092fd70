package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Dev tool: time the stages of the attribution rewrite on a given
  * SF dir (SPARK_GRAFT_SF_DIR), old plan vs new plan vs pieces. */
object ProfileAttr {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  (rows=$n)")
    }
    val ev = Tables.events(spark, d).withColumn("ts_us", unix_micros(col("ts")))
    time("warmup count")(ev.count())

    // OLD plan: one RANGE window
    val W = graft.queries.Events.AttrWindowUs
    def oldPlan = {
      val look = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
        .rangeBetween(-W, Window.currentRow)
      val clickTs = when(col("event_type") === "click", col("ts_us"))
      ev.withColumn("first_click_us", min(clickTs).over(look))
        .withColumn("last_click_us", max(clickTs).over(look))
        .withColumn("n_clicks_win", count(clickTs).over(look))
        .where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("first_click_us"), col("last_click_us"), col("n_clicks_win"))
    }
    time("old plan run1")(oldPlan.count())
    time("old plan run2")(oldPlan.count())

    // NEW plan
    def newPlan = graft.queries.Events.attributionOver(ev)
    time("new plan run1")(newPlan.count())
    time("new plan run2")(newPlan.count())

    // pieces
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts_us").as("c_ts"), col("event_id").as("c_id"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    time("clicks count")(clicks.count())
    time("purchases count")(purchases.count())
    val seqW = Window.partitionBy(col("user_id")).orderBy(col("c_ts"), col("c_id"))
    val cseq = clicks.withColumn("_idx", row_number().over(seqW))
    time("cseq window")(cseq.count())
    val data = cseq.select(col("user_id"), col("c_ts").as("_k"),
      lit(1).as("_tag"), lit(null).cast("long").as("p_id"))
    val loProbe = purchases.select(col("user_id"),
      (col("ts_us") - lit(W)).as("_k"), lit(0).as("_tag"),
      col("event_id").as("p_id"))
    val hiProbe = purchases.select(col("user_id"), col("ts_us").as("_k"),
      lit(2).as("_tag"), col("event_id").as("p_id"))
    val run = Window.partitionBy(col("user_id")).orderBy(col("_k"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bounds = data.unionByName(loProbe).unionByName(hiProbe)
      .withColumn("_pc", sum(when(col("_tag") === 1, 1L).otherwise(0L)).over(run))
      .where(col("_tag") =!= 1)
      .groupBy(col("p_id"))
      .agg(max(when(col("_tag") === 0, col("_pc"))).as("_lo"),
        max(when(col("_tag") === 2, col("_pc"))).as("_hi"))
    time("bounds merge+group")(bounds.count())
    spark.stop()
  }
}
