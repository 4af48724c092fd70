package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventsStream

/** Top-level so Spark can generate an Encoder without an outer scope. */
case class Ev(ts: Timestamp, event_type: String, value: Double)

/** Streaming twin correctness: the same transform over a MemoryStream
  * must produce the batch result once all data is processed. */
class StreamingSpec extends SparkSpec {

  private def mkEvents: Seq[Ev] = (0 until 100).map { i =>
    Ev(Timestamp.valueOf(f"2024-01-01 ${i % 5}%02d:0${i % 6}:00"),
      if (i % 2 == 0) "click" else "view", i.toDouble)
  }

  test("streaming tumbling agg equals batch tumbling agg") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val events = mkEvents
    val stream = MemoryStream[Ev]
    stream.addData(events)
    val q = EventsStream.tumblingAgg(stream.toDF())
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("tumbling_out")
      .orderBy("hour_start", "event_type").collect()
    val batch = EventsStream.tumblingAgg(events.toDF())
      .orderBy("hour_start", "event_type").collect()
    assert(streamed.sameElements(batch))
  }

  test("streaming dedup drops repeated ids across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(Long, Timestamp, Double)]
    val df = stream.toDF().toDF("event_id", "ts", "value")
    val q = EventsStream.dedupStream(df, "1 hour")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    val t = Timestamp.valueOf("2024-01-01 10:00:00")
    try {
      stream.addData((1L, t, 1.0), (2L, t, 2.0), (1L, t, 1.0))
      q.processAllAvailable()
      // 2 is a cross-batch dup; the second 2 has a DIFFERENT ts and must
      // still be dropped (dedup is keyed on event_id alone)
      val t2 = Timestamp.valueOf("2024-01-01 10:05:00")
      stream.addData((2L, t2, 2.0), (3L, t, 3.0))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("dedup_out").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }

  test("stateful user counts run in update mode") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(Long, Double)]
    stream.addData(Seq((1L, 1.0), (1L, 2.0), (2L, 5.0)))
    val df = stream.toDF().toDF("user_id", "value")
    val q = EventsStream.userCounts(df)
      .writeStream.format("memory").queryName("user_out")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("user_out").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L) == ((2L, 3.0)))
    assert(out(2L) == ((1L, 5.0)))
  }
}
