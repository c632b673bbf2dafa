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
  * A session = events of one user separated by < `gapSeconds`. State per
  * key is the user's OPEN sessions as disjoint merged intervals (late
  * in-watermark events may open an earlier interval or bridge two, so a
  * single-open-session state would mis-merge out-of-order arrivals); a
  * session is emitted only once the event-time watermark passes its
  * close deadline, at which point no in-watermark event can change it —
  * the emitted set equals the batch gaps-and-islands computation. Open
  * intervals per user are bounded by the watermark horizon / gap, so
  * state stays small at any scale.
  */
object SessionizeStream {

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(start: Long, last: Long, n: Int, cents: Long)
  case class OpenSessions(sessions: Seq[SessionState])
  case class Session(user_id: Long, start: Timestamp, end: Timestamp,
      n_events: Int, total_cents: Long)

  val GapSeconds = 1800L

  /** Processes one user's new events against the open-session state. */
  def updateSessions(userId: Long, events: Iterator[Event],
      state: GroupState[OpenSessions]): Iterator[Session] = {
    val gapMs = GapSeconds * 1000
    val out = Vector.newBuilder[Session]
    def close(s: SessionState): Unit =
      out += Session(userId, new Timestamp(s.start), new Timestamp(s.last),
        s.n, s.cents)
    def arm(open: Seq[SessionState]): Unit = {
      state.update(OpenSessions(open))
      // earliest close deadline; must stay strictly above the watermark
      state.setTimeoutTimestamp(math.max(
        open.map(_.last).min + gapMs, state.getCurrentWatermarkMs() + 1))
    }
    if (state.hasTimedOut) {
      val wm = state.getCurrentWatermarkMs()
      val (closed, open) = state.get.sessions.partition(_.last + gapMs <= wm)
      closed.sortBy(_.start).foreach(close)
      if (open.isEmpty) state.remove() else arm(open)
    } else {
      // Past-watermark stragglers: a too-late event could re-open an
      // already-emitted session and emit a duplicate. Spark's
      // FlatMapGroupsWithStateExec already filters rows below the
      // watermark before this function runs (verified by
      // SessionizeStreamSpec — even open-interval stragglers never
      // arrive), so below-watermark data diverging from the batch
      // result is the standard streaming contract; this filter is the
      // defense in depth that keeps the no-duplicates property local
      // and version-independent.
      val wm = state.getCurrentWatermarkMs()
      val incoming = events.filter(_.ts.getTime >= wm).map { e =>
        val t = e.ts.getTime
        SessionState(t, t, 1, math.round(e.value * 100))
      }.toVector
      val all = (state.getOption.map(_.sessions).getOrElse(Seq.empty) ++ incoming)
        .sortBy(s => (s.start, s.last))
      // interval merge: adjacent sessions within the gap coalesce
      val merged = all.foldLeft(Vector.empty[SessionState]) { (acc, s) =>
        acc.lastOption match {
          case Some(p) if s.start - p.last <= gapMs =>
            acc.init :+ p.copy(last = math.max(p.last, s.last),
              n = p.n + s.n, cents = p.cents + s.cents)
          case _ => acc :+ s
        }
      }
      if (merged.nonEmpty) arm(merged)
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
      .flatMapGroupsWithState[OpenSessions, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(updateSessions)
  }
}
