package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming: session windows via
  * KeyValueGroupedDataset.flatMapGroupsWithState — the Spark-native
  * mechanism for operator state the built-in windowed aggregations can't
  * express (the reference has no streaming at all; SURVEY.md §2.6).
  *
  * A session = events of one user separated by < `gapSeconds`. Sessions
  * are emitted when closed by the event-time timeout; state per key is
  * one open session (bounded memory per user — safe at any scale).
  */
object SessionizeStream {

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(start: Long, last: Long, n: Int, cents: Long)
  case class Session(user_id: Long, start: Timestamp, end: Timestamp,
      n_events: Int, total_cents: Long)

  val GapSeconds = 1800L

  /** Processes one user's new events against the open-session state.
    * Event order within a batch is not guaranteed — sort locally (the
    * per-group batch fits memory: one user's events per micro-batch). */
  def updateSessions(userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    val out = Vector.newBuilder[Session]
    def close(s: SessionState): Unit =
      out += Session(userId, new Timestamp(s.start), new Timestamp(s.last),
        s.n, s.cents)
    if (state.hasTimedOut) {
      state.getOption.foreach(close)
      state.remove()
    } else {
      val sorted = events.toVector.sortBy(_.ts.getTime)
      var cur = state.getOption
      sorted.foreach { e =>
        val t = e.ts.getTime
        val cents = math.round(e.value * 100)
        cur match {
          case Some(s) if t - s.last <= GapSeconds * 1000 =>
            cur = Some(s.copy(last = math.max(s.last, t), n = s.n + 1,
              cents = s.cents + cents))
          case Some(s) =>
            close(s)
            cur = Some(SessionState(t, t, 1, cents))
          case None =>
            cur = Some(SessionState(t, t, 1, cents))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // close the session once event time passes last+gap
        state.setTimeoutTimestamp(s.last + GapSeconds * 1000)
      }
    }
    out.result().iterator
  }

  /** Wire a streaming events DataFrame (ts, user_id, value) into emitted
    * closed sessions. */
  def sessions(events: DataFrame): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "1 hour")
      .select($"user_id", $"ts", $"value").as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(updateSessions)
  }
}
