package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time temporal table join for streams — the streaming counterpart
  * of [[graft.operators.TemporalJoin.asof]]: each fact row is enriched with
  * the dimension version in force at the fact's event time (greatest
  * dim.ts ≤ fact.ts per key), the join Flink calls a "temporal join" and
  * kdb calls `aj` on a ticking table.
  *
  * Correctness under out-of-order arrival is the hard part: a fact cannot
  * be finalized until every dim version that might precede it has arrived.
  * So facts BUFFER per key until the watermark passes their event time,
  * then emit matched against the buffered version history. State is
  * bounded on both sides:
  *   - pending facts: at most the watermark delay's worth per key;
  *   - dim versions: pruned to (latest version at-or-before the watermark)
  *     + all newer — the only versions any future fact can still need.
  *
  * At scale the state store shards by key (same argument as
  * [[SessionizeStream]]); nothing grows with stream history. Late rows
  * beyond the watermark are dropped by Spark before they reach the
  * function — standard watermark semantics, stated rather than hidden.
  *
  * Both streams ride one envelope ([[TEvent]]) so a single watermark and
  * one keyed state pass serve the union — callers tag facts/dims with
  * [[facts]]/[[dims]] and union before calling [[enrich]].
  */
object TemporalEnrichStream {

  /** Union envelope: `isDim` rows carry (ts, payload) dimension versions;
    * fact rows carry (ts, value). */
  final case class TEvent(key: Long, ts: java.sql.Timestamp, isDim: Boolean,
      value: Double, payload: String)

  final case class Enriched(key: Long, ts: Long, value: Double,
      dimTs: Long, payload: String) // dimTs = -1, payload = "" when no version

  final case class EnrichState(
      versions: List[(Long, String)],   // dim (ts, payload), ascending ts
      pending: List[(Long, Double)])    // facts (ts, value) awaiting watermark

  def facts(key: Long, ts: java.sql.Timestamp, value: Double): TEvent =
    TEvent(key, ts, isDim = false, value, "")
  def dims(key: Long, ts: java.sql.Timestamp, payload: String): TEvent =
    TEvent(key, ts, isDim = true, 0.0, payload)

  /** The input must carry a watermark on `ts`. Emits each fact exactly once,
    * when the watermark passes its event time.
    */
  def enrich(events: Dataset[TEvent]): Dataset[Enriched] = {
    implicit val outEnc = Encoders.product[Enriched]
    implicit val stEnc  = Encoders.product[EnrichState]
    implicit val keyEnc = Encoders.scalaLong

    events.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: Long, batch: Iterator[TEvent], state: GroupState[EnrichState]) => {
          val wm = state.getCurrentWatermarkMs()
          var st = state.getOption.getOrElse(EnrichState(Nil, Nil))

          if (!state.hasTimedOut) {
            val rows = batch.toSeq
            // ingest dim versions: last write wins per (key, ts)
            val newVs = rows.filter(_.isDim).map(e => e.ts.getTime -> e.payload)
            if (newVs.nonEmpty)
              st = st.copy(versions =
                (st.versions.toMap ++ newVs).toList.sortBy(_._1))
            val newFacts = rows.filterNot(_.isDim).map(e => e.ts.getTime -> e.value)
            if (newFacts.nonEmpty)
              st = st.copy(pending = (st.pending ++ newFacts).sortBy(identity))
          }

          // flush: every pending fact the watermark has sealed
          val (ripe, waiting) = st.pending.partition(_._1 <= wm)
          val out = ripe.map { case (fts, v) =>
            st.versions.takeWhile(_._1 <= fts).lastOption match {
              case Some((dts, p)) => Enriched(key, fts, v, dts, p)
              case None           => Enriched(key, fts, v, -1L, "")
            }
          }
          // prune versions no future fact (all > wm) can need: keep the
          // latest at-or-before the watermark plus everything newer
          val (old, live) = st.versions.partition(_._1 <= wm)
          st = EnrichState(old.lastOption.toList ++ live, waiting)

          if (st.versions.isEmpty && st.pending.isEmpty) state.remove()
          else {
            state.update(st)
            // wake when the earliest waiting fact ripens (must be > wm here:
            // everything ≤ wm was just flushed)
            st.pending.headOption.foreach { case (t, _) =>
              state.setTimeoutTimestamp(t)
            }
          }
          out.iterator
        })
  }
}
