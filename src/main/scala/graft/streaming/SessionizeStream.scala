package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming sessionization with explicit per-key state — the
  * Structured-Streaming counterpart of the batch [[graft.operators.Sessionize]]
  * (same gap semantics), built on `flatMapGroupsWithState` +
  * event-time timeout.
  *
  * State per user is ONE open session (constant size); closed sessions are
  * emitted either when a later event of the same user arrives past the gap,
  * or when the watermark passes the open session's gap deadline (event-time
  * timeout). At scale the state store shards by user key — no state grows
  * with history, and late events beyond the watermark are dropped by Spark
  * before they reach the function.
  */
object SessionizeStream {

  final case class SEvent(userId: Long, ts: java.sql.Timestamp, value: Double)
  final case class OpenSession(start: Long, last: Long, n: Long, total: Double)
  final case class ClosedSession(userId: Long, sessionStart: Long,
      sessionEnd: Long, nEvents: Long, totalValue: Double)

  /** gapMs: a session closes after this much event-time silence. The input
    * must carry a watermark on `ts` (the spec uses 10 minutes).
    */
  def sessionize(events: Dataset[SEvent], gapMs: Long): Dataset[ClosedSession] = {
    implicit val outEnc = Encoders.product[ClosedSession]
    implicit val stEnc  = Encoders.product[OpenSession]
    implicit val keyEnc = Encoders.scalaLong

    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, batch: Iterator[SEvent], state: GroupState[OpenSession]) => {
          if (state.hasTimedOut) {
            // watermark passed start-of-silence + gap: close the open session
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(userId, s.start, s.last, s.n, s.total))
          } else {
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
            var open = state.getOption
            for (e <- sorted) {
              val t = e.ts.getTime
              open match {
                case Some(s) if t - s.last > gapMs =>
                  closed += ClosedSession(userId, s.start, s.last, s.n, s.total)
                  open = Some(OpenSession(t, t, 1L, e.value))
                case Some(s) =>
                  open = Some(s.copy(last = math.max(s.last, t), n = s.n + 1,
                    total = s.total + e.value))
                case None =>
                  open = Some(OpenSession(t, t, 1L, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.iterator
          }
        })
  }
}
