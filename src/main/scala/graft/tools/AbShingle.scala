package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Tables, SparkEntry}
import graft.dedup.Dedup

/** Dev harness (round 14): interleaved A/B of the window-based vs
  * array-based shingle builders inside ONE warmed session, so rig
  * drift between runs cannot masquerade as a code delta. Times the
  * full consumer shapes (signature aggregate / capped pair counts),
  * alternating A,B,A,B,… and reporting per-variant mins. */
object AbShingle {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d)
      .repartition(spark.sparkContext.defaultParallelism)

    // ---- variant A: the r13 window-based builders (verbatim copies)
    def minhashShingleRowsOld(n: Int): DataFrame = {
      val byPos = Window.partitionBy(col("id")).orderBy(col("pos"))
      docs
        .select(col("doc_id").as("id"),
          posexplode(split(col("text"), "\\s+")).as(Seq("pos", "word")))
        .withColumn("np", count(lit(1)).over(Window.partitionBy(col("id"))))
        .select(col("id"), col("pos"), col("np"),
          concat_ws(" ",
            col("word") +: (1 until n).map(k => lead(col("word"), k).over(byPos)): _*)
            .as("sh"))
        .where(col("pos") <= col("np") - n)
        .select(col("id"),
          conv(substring(md5(col("sh")), 1, 15), 16, 10).cast("long").as("s_id"))
        .distinct()
    }
    def shingleRowsOld(blockCols: Seq[String], n: Int): DataFrame = {
      val tok = docs.select(
        (col("doc_id").as("id") +: blockCols.map(col)) :+
          posexplode(split(col("text"), "\\s+")).as(Seq("pos", "word")): _*)
        .select((col("id") +: blockCols.map(col)) :+
          col("pos") :+ xxhash64(col("word")).as("h"): _*)
      val w = Window.partitionBy(col("id")).orderBy(col("pos"))
      val parts = col("h") +: (1 until n).map(k => lead(col("h"), k).over(w))
      tok
        .withColumn("np", count(lit(1)).over(Window.partitionBy(col("id"))))
        .withColumn("h3", xxhash64(parts: _*))
        .where(col("pos") <= col("np") - n)
        .select((col("id") +: blockCols.map(col)) :+ col("h3"): _*)
        .distinct()
    }

    def run(df: => DataFrame): Double = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both shapes once
    run(Dedup.minhashSigTable(minhashShingleRowsOld(3)))
    run(Dedup.minhashSigTable(Dedup.minhashShingleRows(docs, "doc_id", "text", 3)))

    val cases: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("sig_n3",
        () => Dedup.minhashSigTable(minhashShingleRowsOld(3)),
        () => Dedup.minhashSigTable(
          Dedup.minhashShingleRows(docs, "doc_id", "text", 3))),
      ("shingle_only_n5",
        () => minhashShingleRowsOld(5),
        () => Dedup.minhashShingleRows(docs, "doc_id", "text", 5)),
      ("jacc_rows_n3",
        () => shingleRowsOld(Seq("lang", "source"), 3),
        () => Dedup.shingleRows(docs, "doc_id", "text",
          Seq("lang", "source"), 3)))
    cases.foreach { case (name, a, b) =>
      // truly interleaved A,B,A,B,… (round 15 ADVICE fix — the r14
      // loop ran all A reps then all B reps, which the header's
      // rig-drift claim did not match)
      val reps = (1 to 3).map(_ => (run(a()), run(b())))
      val (as, bs) = (reps.map(_._1), reps.map(_._2))
      println(f"[ab] $name old=${as.min}%.3f new=${bs.min}%.3f " +
        f"ratio=${bs.min / as.min}%.2f")
    }
    spark.stop()
  }
}
