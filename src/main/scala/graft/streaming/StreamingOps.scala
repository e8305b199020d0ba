package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators (SURVEY.md §2.10).
  *
  * The reference is batch-only; its stateful constructs (conversation
  * windows W1/W2) map to these streaming twins per the north star:
  * event-time windowed aggregation with watermarks, and gap-based
  * sessionization via flatMapGroupsWithState. Each operator works on both a
  * streaming and a batch DataFrame (same code path — Structured Streaming's
  * contract), so the batch oracle queries in EventQueries double as the
  * correctness reference for the streaming plans.
  */
object StreamingOps {

  /** Event row for typed stateful ops. */
  case class Event(ts: Timestamp, user_id: Long, event_type: String, value: Double)

  /** Emitted session summary. */
  case class Session(user_id: Long, session_start: Timestamp, session_end: Timestamp,
                     n_events: Long, total_value: Double)

  case class SessionState(start: Long, end: Long, n: Long, total: Double)

  /** Tumbling/sliding event-time window aggregation with a watermark: the
    * streaming twin of EventQueries.evt_hourly_stats. */
  def windowedStats(events: DataFrame, windowDuration: String = "1 hour",
                    slideDuration: Option[String] = None,
                    watermarkDelay: String = "10 minutes"): DataFrame = {
    val win = slideDuration match {
      case Some(slide) => window(col("ts"), windowDuration, slide)
      case None        => window(col("ts"), windowDuration)
    }
    events.withWatermark("ts", watermarkDelay)
      .groupBy(win.as("window"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value").cast("decimal(38,6)")).cast("double").as("total_value"))
  }

  /** Gap-based sessionization with explicit state: a session closes after
    * `gapMinutes` of per-user inactivity (event-time timeout). Streaming
    * twin of the batch lag/cumsum sessionization in EventQueries. */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    events.withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          val out = scala.collection.mutable.ListBuffer.empty[Session]
          var cur = state.getOption
          if (state.hasTimedOut) {
            cur.foreach(s => out += Session(userId, new Timestamp(s.start),
              new Timestamp(s.end), s.n, s.total))
            state.remove()
            cur = None
          }
          for (e <- batch.toSeq.sortBy(_.ts.getTime)) {
            cur match {
              case Some(s) if e.ts.getTime - s.end <= gapMs =>
                // min/max: a late (but not watermark-dropped) event from an
                // earlier micro-batch must never move the bounds backwards
                cur = Some(SessionState(math.min(s.start, e.ts.getTime),
                  math.max(s.end, e.ts.getTime), s.n + 1, s.total + e.value))
              case Some(s) =>
                out += Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n, s.total)
                cur = Some(SessionState(e.ts.getTime, e.ts.getTime, 1L, e.value))
              case None =>
                cur = Some(SessionState(e.ts.getTime, e.ts.getTime, 1L, e.value))
            }
          }
          cur.foreach { s =>
            state.update(s)
            state.setTimeoutTimestamp(s.end + gapMs)
          }
          out.iterator
      }
  }

  /** Streaming exact dedup: first occurrence per key wins, with
    * watermark-bounded state — the streaming twin of
    * Dedup.dropExactDuplicates for continuous ingestion (re-crawled or
    * re-delivered documents dropped at the door, state evicted once the
    * watermark passes). `keyCols` would be the content digest column in the
    * ingestion pipeline. */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
                  watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** W1/W2 streaming twin: running last-N conversation window per key kept
    * in state; emits the trimmed history on every update. Idle keys are
    * evicted once the watermark passes `idleGapMs` beyond their newest
    * event (an unbounded user-id space would otherwise grow the state store
    * without bound); a timed-out key simply restarts its window on its next
    * event. Event-time eviction (not processing-time) so timeouts advance
    * with the data, never with wall-clock trigger loops. */
  def lastNPerKey(events: Dataset[Event], n: Int = 10,
                  watermarkDelay: String = "10 minutes",
                  idleGapMs: Long = 60L * 60 * 1000): Dataset[(Long, Seq[Long])] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Seq[Long], (Long, Seq[Long])](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[Seq[Long]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prior = state.getOption.getOrElse(Seq.empty)
            val updated = (prior ++ batch.toSeq.sortBy(_.ts.getTime).map(_.ts.getTime))
              .takeRight(n)
            state.update(updated)
            state.setTimeoutTimestamp(
              math.max(updated.max + idleGapMs, state.getCurrentWatermarkMs() + 1))
            Iterator((userId, updated))
          }
      }
  }
}
