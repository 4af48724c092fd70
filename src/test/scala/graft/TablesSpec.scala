package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Tables.events must normalize BOTH physical `ts` encodings the
  * testdata has shipped with — INT64 nanos (read as LongType under
  * `nanosAsLong`) and TIMESTAMP(MICROS) without UTC adjustment (read
  * as TIMESTAMP_NTZ) — to one TimestampType with identical wall-clock
  * instants, so every downstream window/range/stream query is
  * type-stable across testdata generations. */
class TablesSpec extends SparkSpec {

  // 2024-01-02T03:04:05.123456Z in epoch microseconds
  private val micros = 1704164645123456L

  private def writeEvents(dir: String, tsCol: org.apache.spark.sql.Column,
      tsType: DataType): Unit = {
    import spark.implicits._
    Seq((1L, 7L, "click", 1.5, "{}"))
      .toDF("event_id", "user_id", "event_type", "value", "props")
      .withColumn("ts", tsCol.cast(tsType))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("events.ts: TIMESTAMP_NTZ micros normalizes to TimestampType, same wall clock") {
    val dir = Files.createTempDirectory("graft_tbl_ntz").toString
    writeEvents(dir, lit(micros).cast(LongType), LongType)
    // rewrite ts as NTZ micros of the same instant
    import spark.implicits._
    Seq((1L, 7L, "click", 1.5, "{}"))
      .toDF("event_id", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(lit(micros)).cast(TimestampNTZType))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType === TimestampType)
    val got = df.select(unix_micros(col("ts"))).head.getLong(0)
    assert(got === micros)
  }

  test("events.ts: INT64 nanos normalizes to TimestampType, truncated to micros") {
    val dir = Files.createTempDirectory("graft_tbl_ns").toString
    // raw long nanos exercises the LongType branch (same shape the
    // nanosAsLong reader produces for TIMESTAMP(NANOS) files)
    writeEvents(dir, lit(micros * 1000L + 789L), LongType)
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType === TimestampType)
    val got = df.select(unix_micros(col("ts"))).head.getLong(0)
    assert(got === micros) // sub-microsecond nanos truncate, not round
  }
}
