package graft

import java.nio.file.Files
import graft.sources.Sources

/** Round-trip the sources: table() ingestion + parquet/csv/json IO. */
class SourcesSpec extends SparkSpec {

  test("table() builds a relation from in-memory rows (reference parity)") {
    val t = Sources.table(spark, Seq(
      Map("name" -> "Bob", "balance" -> -300),
      Map("name" -> "Alice", "balance" -> 400)))
    assert(t.count() == 2)
    assert(t.columns.sorted.toSeq == Seq("balance", "name"))
  }

  test("parquet round-trip preserves schema and rows, csv/json round-trip rows") {
    val dir = Files.createTempDirectory("graft_sources").toString
    val src = Tables.nation(spark, sf)
    Sources.writeParquet(src, s"$dir/p", partitionBy = Seq("n_regionkey"))
    val p = Sources.readParquet(spark, s"$dir/p")
    assert(p.count() == src.count())
    assert(p.columns.toSet == src.columns.toSet)
    Sources.writeCsv(src, s"$dir/c")
    assert(Sources.readCsv(spark, s"$dir/c").count() == src.count())
    Sources.writeJson(src, s"$dir/j")
    assert(Sources.readJson(spark, s"$dir/j").count() == src.count())
  }

  test("orc round-trip preserves rows and pushes filters to the scan") {
    val dir = Files.createTempDirectory("graft_orc").toString
    val src = Tables.nation(spark, sf)
    Sources.writeOrc(src, s"$dir/o")
    val o = Sources.readOrc(spark, s"$dir/o")
    assert(o.count() == src.count())
    assert(o.columns.toSet == src.columns.toSet)
    val plan = o.where(org.apache.spark.sql.functions.col("n_nationkey") > 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(n_nationkey)"),
      s"ORC scan did not receive pushed filters:\n$plan")
  }

  test("partitioned parquet write enables partition pruning") {
    val dir = Files.createTempDirectory("graft_part").toString
    Sources.writeParquet(Tables.nation(spark, sf), s"$dir/p",
      partitionBy = Seq("n_regionkey"))
    val pruned = Sources.readParquet(spark, s"$dir/p")
      .where(org.apache.spark.sql.functions.col("n_regionkey") === 1)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(n_regionkey"),
      s"no partition pruning:\n$plan")
  }
}
