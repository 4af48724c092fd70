package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization with custom per-key state —
  * `flatMapGroupsWithState` (SURVEY.md §2 streaming).
  *
  * Batch sessionization (queries.Events.qEventsSessionize) is lag+cumsum;
  * on an unbounded stream the same semantics need explicit state: per
  * user, an open session accumulates events until `gapSeconds` of
  * silence, then closes and is emitted. State is one small record per
  * active user — bounded by the active-user cardinality, the shape that
  * scales on a cluster with watermark-driven timeout eviction. */
object Sessionize {

  case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)

  case class SessionState(
      sessionStart: Long, lastTs: Long, nEvents: Long, sumValue: Double)

  case class SessionOut(
      user_id: Long, session_start_us: Long, session_end_us: Long,
      n_events: Long, sum_value: Double)

  /** @param timeout state-eviction mode: production uses
    *   `ProcessingTimeTimeout` (or event-time + watermark) so idle
    *   users' open sessions eventually close and their state is freed;
    *   `NoTimeout` (default) closes sessions on gap detection only —
    *   with processing-time timeouts Spark keeps scheduling timeout
    *   batches, so `processAllAvailable` never settles in tests. */
  def sessionize(
      events: Dataset[SessionEvent],
      gapSeconds: Long,
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout)(
      implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, timeout) {
        (userId: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val closed = state.getOption.map { s =>
              SessionOut(userId, s.sessionStart, s.lastTs, s.nEvents, s.sumValue)
            }
            state.remove()
            closed.iterator
          } else {
            // events within a micro-batch arrive unordered — sort by time
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.value))
            val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            var cur = state.getOption
            for (e <- sorted) {
              val tsUs = e.ts.getTime * 1000L
              cur match {
                case Some(s) if tsUs - s.lastTs > gapUs =>
                  out += SessionOut(userId, s.sessionStart, s.lastTs, s.nEvents, s.sumValue)
                  cur = Some(SessionState(tsUs, tsUs, 1L, e.value))
                case Some(s) =>
                  cur = Some(SessionState(s.sessionStart, tsUs, s.nEvents + 1, s.sumValue + e.value))
                case None =>
                  cur = Some(SessionState(tsUs, tsUs, 1L, e.value))
              }
            }
            cur.foreach(state.update)
            if (timeout == GroupStateTimeout.ProcessingTimeTimeout) {
              state.setTimeoutDuration(gapSeconds * 1000 * 2)
            }
            out.iterator
          }
      }
  }
}
