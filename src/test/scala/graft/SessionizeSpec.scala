package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Sessionize
import graft.streaming.Sessionize.{SessionEvent, SessionOut}

/** flatMapGroupsWithState sessionization: sessions split on gaps, state
  * carries across micro-batches. */
class SessionizeSpec extends SparkSpec {

  private def ev(user: Long, minute: Int, value: Double) =
    SessionEvent(user, Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00"), value)

  test("sessions split on gaps and carry state across micro-batches") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[SessionEvent]
    val q = Sessionize.sessionize(stream.toDS(), gapSeconds = 300)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      // batch 1: user 1 events at 10:00 and 10:02 (one open session)
      stream.addData(ev(1, 0, 1.0), ev(1, 2, 2.0))
      q.processAllAvailable()
      // batch 2: 10:03 extends the open session; 10:30 closes it and opens a new one
      stream.addData(ev(1, 3, 3.0), ev(1, 30, 4.0))
      q.processAllAvailable()
      val closed = spark.table("sessions_out").as[SessionOut].collect()
      assert(closed.length == 1)
      val sess = closed.head
      assert(sess.user_id == 1L)
      assert(sess.n_events == 3L) // 10:00, 10:02, 10:03
      assert(sess.sum_value == 6.0)
    } finally q.stop()
  }
}
