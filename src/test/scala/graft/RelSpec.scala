package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.api.Rel

/** Semantics of the fluent Rel verbs, mirroring the reference's test
  * expectations (/root/reference/stupidb/tests/test_stupidb.py,
  * test_set_operations.py): set-op duplicate handling, limit/offset,
  * full join completing the reference's unimplemented case, and
  * total-vs-sum empty semantics.
  */
class RelSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def df(rows: Seq[(String, Int)]) = {
    spark.createDataFrame(rows).toDF("name", "balance")
  }

  private val t = Seq("Bob" -> -300, "Bob" -> -100, "Alice" -> 400, "Alice" -> 700)

  test("select computes new columns") {
    val out = Rel(df(t)).select(
      "lower_name" -> lower(col("name"))).toDF.collect().map(_.getString(0))
    assert(out.toSeq == Seq("bob", "bob", "alice", "alice"))
  }

  test("sift filters rows") {
    val out = Rel(df(t)).sift(col("name").startsWith("A")).toDF.count()
    assert(out == 2)
  }

  test("union removes duplicates, unionAll keeps them") {
    val a = Rel(df(t))
    assert(a.union(a).toDF.count() == 4)
    assert(a.unionAll(a).toDF.count() == 8)
  }

  test("intersectAll keeps min multiplicity; differenceAll saturates") {
    val x = Rel(df(Seq("a" -> 1, "a" -> 1, "b" -> 2)))
    val y = Rel(df(Seq("a" -> 1, "b" -> 2, "b" -> 2)))
    assert(x.intersectAll(y).toDF.count() == 2) // one (a,1) + one (b,2)
    assert(x.differenceAll(y).toDF.count() == 1) // one surplus (a,1)
    assert(x.difference(y).toDF.count() == 0)
  }

  test("limit with offset skips rows in order") {
    val out = Rel(df(t)).orderBy(col("balance"))
      .limit(2, offset = 1).toDF.collect().map(_.getInt(1))
    assert(out.toSeq == Seq(-100, 400))
  }

  test("full join keeps both unmatched sides (reference raises here)") {
    val l = Rel(df(Seq("a" -> 1, "b" -> 2)).withColumnRenamed("balance", "lb"))
    val r = Rel(df(Seq("b" -> 20, "c" -> 30))
      .withColumnRenamed("name", "rname").withColumnRenamed("balance", "rb"))
    val j = l.fullJoin(r, col("name") === col("rname")).toDF
    assert(j.count() == 3)
    assert(j.where(col("name").isNull).count() == 1)
    assert(j.where(col("rname").isNull).count() == 1)
  }

  test("semi/anti join partition rows exactly") {
    val l = Rel(df(t))
    val r = Rel(df(Seq("Alice" -> 0))).select("rname" -> col("name"))
    val semi = l.semiJoin(r, col("name") === col("rname")).toDF.count()
    val anti = l.antiJoin(r, col("name") === col("rname")).toDF.count()
    assert(semi == 2 && anti == 2)
  }

  test("total of empty group is 0, sum is NULL (stupidb test_total_vs_sum)") {
    val empty = Rel(df(t)).sift(col("balance") > 10000)
    val agg = empty.aggregate(
      "total" -> coalesce(sum(col("balance")), lit(0L)),
      "plain_sum" -> sum(col("balance"))).toDF.collect()(0)
    assert(agg.getLong(0) == 0L)
    assert(agg.isNullAt(1))
  }

  test("iterator and pretty mirror the reference's presentation verbs") {
    val r = Rel(df(t)).orderBy(col("balance"))
    assert(r.iterator.size == 4)
    val p = r.pretty(2)
    assert(p.contains("name") && p.contains("balance"))
    assert(p.contains("-300") && !p.contains("700")) // limited to 2 rows
  }

  test("exists is a terminal boolean") {
    assert(Rel(df(t)).sift(col("balance") > 500).exists)
    assert(!Rel(df(t)).sift(col("balance") > 5000).exists)
  }

  test("varLead and overVarFrame expose the callable-offset/bounds verbs") {
    val base = df(t).withColumn("k", monotonically_increasing_id())
    // per-row offset 1 ≡ constant lead(1)
    val led = Rel(base).varLead(Seq("name"), Seq(col("balance")),
      col("balance"), lit(1), "nxt").toDF
    val wantLead = base.withColumn("nxt",
      lead(col("balance"), 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("name")).orderBy(col("balance"))))
    assert(led.exceptAll(wantLead).isEmpty && wantLead.exceptAll(led).isEmpty)
    // per-row bounds (1 preceding, 0 following) ≡ native ROWS frame
    val framed = Rel(base).overVarFrame(Seq("name"), Seq(col("balance")),
      col("balance"), lit(1), lit(0)).toDF
      .select(col("k"), col("vf_cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("name")).orderBy(col("balance")).rowsBetween(-1, 0)
    val wantFrame = base.select(col("k"), count(lit(1)).over(w).as("vf_cnt"))
    assert(framed.exceptAll(wantFrame).isEmpty &&
      wantFrame.exceptAll(framed).isEmpty)
  }

  test("over applies windowed aggregates like the reference's >> over(...)") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("balance"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rows = Rel(df(t))
      .over(w)("running_sum" -> sum(col("balance")),
        "rk" -> row_number())
      .orderBy(col("rk")).toDF.collect()
    val balances = rows.map(_.getAs[Int]("balance").toLong)
    val running = rows.map(_.getAs[Long]("running_sum"))
    assert(running.toSeq == balances.scanLeft(0L)(_ + _).tail.toSeq)
    assert(rows.map(_.getAs[Int]("rk")).toSeq == (1 to rows.length))
  }
}
