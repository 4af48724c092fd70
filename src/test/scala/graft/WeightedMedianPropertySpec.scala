package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Property check of q_agg_weighted_median against the brute-force
  * definition: the smallest value v whose cumulative weight over the
  * ascending value order reaches half the total (2·cumw ≥ total —
  * exactly the query's exact-decimal comparison, replayed here with
  * BigDecimal). Seeded random cases keep the suite deterministic and
  * cover duplicated values (weight collapse), zero weights, and
  * single-row groups. */
class WeightedMedianPropertySpec extends SparkSpec {

  private def brute(rows: Seq[(Double, Double)]): Double = {
    val byVal = rows.groupBy(_._1).view
      .mapValues(_.map(t => BigDecimal(t._2).setScale(4,
        BigDecimal.RoundingMode.HALF_UP)).sum)
      .toSeq.sortBy(_._1)
    val total = byVal.map(_._2).sum
    var cum = BigDecimal(0)
    byVal.find { case (_, w) => cum += w; cum * 2 >= total }.get._1
  }

  test("weighted median matches the brute-force scan on seeded random cases") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    (1 to 12).foreach { i =>
      val flags = Seq("A", "B", "C").take(1 + rnd.nextInt(3))
      val rows = flags.flatMap { f =>
        List.fill(1 + rnd.nextInt(20))(
          (f, (1 + rnd.nextInt(8)).toDouble,
            // mostly positive weights, occasional zero
            if (rnd.nextInt(10) == 0) 0.0 else rnd.nextInt(100) / 4.0))
      }
      val dir = Files.createTempDirectory(s"graft_wmprop_$i").toString
      rows.toDF("l_returnflag", "l_quantity", "l_extendedprice")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      val got = graft.queries.Agg.qAggWeightedMedian(spark, dir).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      flags.foreach { f =>
        val expect = brute(rows.filter(_._1 == f).map(t => (t._2, t._3)))
        assert(got(f) == expect,
          s"case $i flag $f: got ${got(f)}, brute $expect, rows=$rows")
      }
    }
  }
}
