package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class SessEvent(user_id: Long, ts: java.sql.Timestamp) {
  def ts_ms: Long = ts.getTime
}
final case class SessState(start_ms: Long, end_ms: Long, n: Long)
final case class SessionOut(user_id: Long, start_ms: Long, end_ms: Long,
                            n_events: Long)

/** Stateful streaming sessionization over the events table
  * (`KeyValueGroupedDataset.flatMapGroupsWithState` with event-time
  * timeout): per-user sessions close after `gapMinutes` of event-time
  * silence. The state-update rule is the pure function [[fold]] so the
  * semantics are unit-testable without a streaming harness; the
  * streaming wrapper only adds watermark + timeout plumbing.
  */
object Sessionize {

  /** Pure per-batch state fold: merge a batch of events into an open
    * session, emitting every session that closed (gap exceeded between
    * sorted events). Returns (openSession, closedSessions). */
  def fold(state: Option[SessState], events: Seq[SessEvent],
           gapMs: Long): (Option[SessState], Seq[SessionOut]) = {
    val sorted = events.sortBy(_.ts_ms)
    var open = state
    val closed = Seq.newBuilder[SessState]
    sorted.foreach { e =>
      open match {
        // interval membership (not "after end") — batches can deliver
        // late events, so an event may fall inside or before the open
        // session; the session interval only ever widens
        case Some(s) if e.ts_ms >= s.start_ms - gapMs &&
            e.ts_ms <= s.end_ms + gapMs =>
          open = Some(SessState(math.min(s.start_ms, e.ts_ms),
            math.max(s.end_ms, e.ts_ms), s.n + 1))
        case Some(s) if e.ts_ms > s.end_ms + gapMs =>
          closed += s
          open = Some(SessState(e.ts_ms, e.ts_ms, 1))
        case Some(_) =>
          // older than session start minus gap: beyond-late, dropped
          ()
        case None =>
          open = Some(SessState(e.ts_ms, e.ts_ms, 1))
      }
    }
    (open, closed.result().map(s => toOut(0L, s)))
  }

  private def toOut(uid: Long, s: SessState): SessionOut =
    SessionOut(uid, s.start_ms, s.end_ms, s.n)

  /** Streaming sessionization: watermarked event stream → per-user
    * state; closed sessions are emitted in append mode (on gap within a
    * batch, or on event-time timeout across batches).
    *
    * Constraint: the watermark delay must not exceed the session gap.
    * A closed session is final the moment the gap elapses; a watermark
    * longer than the gap would admit events for sessions already
    * emitted, and the fold's beyond-late branch would silently drop
    * them (enforced below rather than documented-only). */
  def sessions(events: DataFrame, gapMinutes: Int = 30,
               watermark: String = "10 minutes"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    val wmMs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(watermark))
    require(wmMs.months == 0 &&
      wmMs.days * 86400000000L + wmMs.microseconds <= gapMs * 1000L,
      s"watermark delay ($watermark) must be <= session gap ($gapMinutes min): " +
        "later events would target sessions that were already emitted")
    // keep the watermarked `ts` column itself through the projection —
    // deriving a new column would strip the watermark tag the
    // event-time timeout requires
    val typed = events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .select(col("user_id").cast("long").as("user_id"), col("ts"))
      .as[SessEvent]
    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[SessEvent], gs: GroupState[SessState]) =>
          if (gs.hasTimedOut) {
            val out = gs.getOption.map(s => toOut(uid, s)).toSeq
            gs.remove()
            out.iterator
          } else {
            val (open, closed) = fold(gs.getOption, it.toSeq, gapMs)
            open.foreach { s =>
              gs.update(s)
              // late events can put end+gap behind the current watermark
              // (Spark rejects a timeout in the past) — clamp forward so
              // the session closes at the next watermark advance
              val floor = gs.getCurrentWatermarkMs() + 1
              gs.setTimeoutTimestamp(math.max(s.end_ms + gapMs, floor))
            }
            closed.map(c => c.copy(user_id = uid)).iterator
          }
      }
  }
}
