package graft

import org.apache.spark.sql.functions._
import graft.sources.ZOrder

/** Z-order layout: interleave correctness and the pruning win it buys
  * over a lead-key sort. */
class ZOrderSpec extends SparkSpec {

  private def asLong(v: Any): Long = v.asInstanceOf[Number].longValue()

  test("zorderValue interleaves bits round-robin, column 0 significant") {
    // x=0b101, y=0b011, bits=3: x bits at positions 2b+1, y at 2b
    // → z = (1<<1)|(1<<5) | (1<<0)|(1<<2) = 39
    val z = spark.range(1)
      .select(ZOrder.zorderValue(Seq(lit(5L), lit(3L)), 3).as("z"))
      .head().getLong(0)
    assert(z == 39L, s"interleave(5, 3, bits=3) = $z, expected 39")
    // generated SQL twin computes the identical value
    val sql = ZOrder.zorderSql(Seq("5", "3"), 3)
    val zSql = asLong(spark.sql(s"SELECT $sql AS z").head().get(0))
    assert(zSql == 39L, s"SQL twin gave $zSql")
  }

  test("normalize maps the domain ends onto the full bit budget") {
    val r = spark.range(1).select(
      ZOrder.normalize(lit(0L), lit(0L), lit(9L), 11).as("lo"),
      ZOrder.normalize(lit(9L), lit(0L), lit(9L), 11).as("hi"),
      ZOrder.normalize(lit(7L), lit(7L), lit(7L), 11).as("flat")).head()
    assert(r.getLong(0) == 0L && r.getLong(1) == 2047L && r.getLong(2) == 0L,
      s"got $r")
  }

  test("interleave is a bijection on the bit budget and SQL twin agrees") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(300)((rnd.nextInt(32).toLong, rnd.nextInt(32).toLong))
      .distinct
    val rows = pairs.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.zorderValue(Seq(col("x"), col("y")), 5).as("z"),
        expr(ZOrder.zorderSql(Seq("x", "y"), 5)).as("zs"))
      .collect()
    // scala twin of the same interleave
    def ref(x: Long, y: Long): Long =
      (0 until 5).foldLeft(0L)((acc, b) =>
        acc | (((x >> b) & 1L) << (2 * b + 1)) | (((y >> b) & 1L) << (2 * b)))
    rows.foreach { r =>
      assert(r.getLong(2) == ref(r.getLong(0), r.getLong(1)))
      assert(r.getLong(3) == r.getLong(2), "SQL twin diverged")
    }
    // distinct pairs → distinct z (bijection within the budget)
    assert(rows.map(_.getLong(2)).distinct.length == pairs.length)
  }

  test("z-order layout prunes a non-lead-dimension predicate; lead-key sort cannot") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
    val ext = li.agg(
      min(col("l_partkey")).as("minp"), max(col("l_partkey")).as("maxp"),
      min(col("l_suppkey")).as("mins"), max(col("l_suppkey")).as("maxs"))
      .head()
    val (minS, maxS) = (ext.getLong(2), ext.getLong(3))
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString

    // lead-key layout: range-sorted by l_partkey only
    li.repartitionByRange(16, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lead")
    // z-order layout on min/max-normalized keys (the writer contract)
    val zcols = Seq(
      ZOrder.normalize(col("l_partkey"), lit(ext.getLong(0)),
        lit(ext.getLong(1)), 11),
      ZOrder.normalize(col("l_suppkey"), lit(minS), lit(maxS), 11))
    ZOrder.layout(li, zcols, 11, 16)
      .write.mode("overwrite").parquet(s"$dir/z")

    // a one-value predicate on the NON-lead dim, mid-domain: count
    // files whose (min,max) suppkey box contains it — exactly what
    // parquet footer pruning skips on
    val probe = minS + (maxS - minS) * 2 / 5
    def filesHit(path: String): (Int, Int) = {
      val files = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
      val hit = files.count { f =>
        val r = spark.read.parquet(f)
          .agg(min("l_suppkey"), max("l_suppkey")).head()
        asLong(r.get(0)) <= probe && asLong(r.get(1)) >= probe
      }
      (hit, files.length)
    }
    val (leadHit, leadN) = filesHit(s"$dir/lead")
    val (zHit, zN) = filesHit(s"$dir/z")
    // lead-key files each span the full suppkey domain → all hit
    assert(leadHit == leadN, s"lead layout: $leadHit/$leadN")
    // z-order boxes the suppkey dimension too → at most ~half the
    // files can contain any one suppkey value
    assert(zHit * 2 <= zN, s"z layout still hit $zHit/$zN files")
    assert(zHit < leadHit)
  }
}
