package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev helper: time ONE registered query in isolation (3 runs, noop
  * sink) without paying for a full Bench sweep —
  * `sbt "runMain graft.tools.TimeOne q_name /root/testdata/sf0.1"`. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.extensions","graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args(0); val sf = args(1)
    val fn = graft.SparkEntry.queries(name)
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime
      fn(spark, sf).write.mode("overwrite").format("noop").save()
      println(f"run$i ${(System.nanoTime - t0)/1e9}%.2f s")
    }
  }
}
