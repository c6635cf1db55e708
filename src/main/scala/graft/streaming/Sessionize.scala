package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization — the canonical stateful log-pipeline operator.
  *
  * Two implementations with identical semantics:
  *  - [[batch]]: the window-function formulation (lag + cumulative sum of
  *    session-break flags) — one shuffle on the user key, oracle-checkable;
  *  - [[streamingSessions]]: `flatMapGroupsWithState` over a streaming
  *    Dataset — an open session lives in [[GroupState]] and survives across
  *    micro-batches (and restarts, via the checkpoint), emitting a session
  *    only once it is closed by a gap. The 100 TB/continuous path: state is
  *    per-key and bounded, no global reprocessing.
  */
object Sessionize {

  /** Batch sessionization: session_seq numbers each user's sessions in time
    * order; a new session starts when the gap to the previous event exceeds
    * `gapMinutes`. Ties broken by event id for determinism. */
  def batch(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("event_ts"), col("event_id"))
    events
      .withColumn("prev_ts", lag(col("event_ts"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull ||
          unix_micros(col("event_ts")) - unix_micros(col("prev_ts")) > gapMinutes * 60L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("is_new")).over(byUser))
      .select(col("event_id"), col("user_id"), col("session_seq"))
  }

  /** One input event for the streaming path. */
  final case class Event(user_id: Long, event_id: Long, ts_micros: Long)
  /** Open-session state carried across micro-batches. */
  final case class OpenSession(start: Long, last: Long, n: Long)
  /** A closed session. */
  final case class Session(user_id: Long, start_micros: Long, end_micros: Long, n_events: Long)

  /** Streaming sessionizer: emits a session when a later event (this batch or
    * a following one) arrives more than `gapMinutes` after the session's last
    * event. The still-open session stays in state. */
  def streamingSessions(events: Dataset[Event], gapMinutes: Int): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[Event], state: GroupState[OpenSession]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts_micros, e.event_id))
          var open = state.getOption
          val closed = Seq.newBuilder[Session]
          sorted.foreach { e =>
            open match {
              case Some(s) if e.ts_micros - s.last > gapMicros =>
                closed += Session(uid, s.start, s.last, s.n)
                open = Some(OpenSession(e.ts_micros, e.ts_micros, 1))
              case Some(s) =>
                open = Some(OpenSession(s.start, e.ts_micros, s.n + 1))
              case None =>
                open = Some(OpenSession(e.ts_micros, e.ts_micros, 1))
            }
          }
          open.foreach(state.update)
          closed.result().iterator
      }
  }
}
