package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Scaling-curve bench: time a named subset of SparkEntry.queries at
  * one SF dir (run once against the source dir and once against a
  * ScaleGen-derived N× dir; the per-query wall-time ratio is the
  * empirical scaling factor SURVEY §6 reports). Same discipline as
  * graft.Bench: warmup pass absorbs JIT, settle() unpins caches
  * between passes, min-of-N is the low-variance statistic, noop sink
  * executes the full plan.
  *
  * Usage: runMain graft.tools.ScaleBench <sfDir> <outJson> <q1,q2,...> [passes]
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outPath = args(1)
    val names = args(2).split(",").toSeq
    val passes = if (args.length > 3) args(3).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // partitions scale with DATA, not cores, on a big derived SF — the
    // spill-aware sizing every real deployment does (SURVEY §4); defaults
    // to cores for parity with Bench at sf0.1
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm codegen/parquet/shuffle paths on the tiny SF
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    Seq("q_dedup_exact", "q_inner_join").foreach { q =>
      try SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[warmup] $q: ${e.getMessage}") }
    }
    def settle(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
      System.gc()
    }
    val results = names.map { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val times = (1 to passes).map { _ =>
        settle()
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[scalebench] $name failed: ${e.getMessage}"); false
          }
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      val v = if (times.exists(_ < 0)) -1.0 else times.min
      println(f"[scalebench] $name%-32s $v%9.3f s")
      (name, v)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val line = s"""{"sf":"$sfDir","stat":"min_of_$passes","queries":$qs}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes("UTF-8"))
    println(line)
    spark.stop()
  }
}
