package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: dump the `.explain("formatted")` output of NAMED queries
  * to individual files — the per-round before/after plan evidence
  * (plans/r<N>/<query>_<tag>.txt).
  *
  *   sbt "runMain graft.tools.PlanDump plans/r14 before q_a,q_b [sfDir]"
  *
  * Explain is driver-only (no job runs), so dumps are cheap and safe
  * to take next to a running bench. Same session shape as Bench
  * (shuffle.partitions = 32) so the dumped shapes match what the
  * bench executes at sf0.1. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args(0))
    val tag = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sf = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    Files.createDirectories(outDir)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sf)
      val txt = df.queryExecution.explainString(
        ExplainMode.fromString("formatted"))
      val f = outDir.resolve(s"${n}_$tag.txt")
      Files.write(f, txt.getBytes("UTF-8"))
      println(s"[plandump] wrote $f")
    }
    spark.stop()
  }
}
