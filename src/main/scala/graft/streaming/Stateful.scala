package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state operators via
  * `KeyValueGroupedDataset.flatMapGroupsWithState` — the engine's
  * stateful layer beyond built-in windowed aggregation: a gap-based
  * sessionizer with event-time timeouts, and cross-batch exact
  * deduplication with state TTL.
  *
  * Scale posture: state lives in the state store keyed by group —
  * per-key size is O(1) (one open session / one seen-marker), and the
  * watermark-driven timeout retires keys, so state is bounded by the
  * number of *active* keys, not stream history.
  */
object Stateful {

  case class Event(userId: Long, ts: Timestamp)
  case class SessionState(start: Long, last: Long, n: Long)
  case class ClosedSession(userId: Long, start: Timestamp, end: Timestamp,
      nEvents: Long)

  /** Gap-based sessionization: events more than `gapMs` apart open a
    * new session; closed sessions are emitted either when a later
    * event proves the gap, or when the event-time watermark passes
    * last + gap (timeout). Input must carry a watermark on `ts`.
    */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[ClosedSession] = {
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[ClosedSession]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(userId,
              new Timestamp(s.start), new Timestamp(s.last), s.n))
          } else {
            val sorted = rows.map(_.ts.getTime).toArray.sorted
            var cur = state.getOption.orNull
            val closed = Seq.newBuilder[ClosedSession]
            sorted.foreach { t =>
              cur match {
                case null => cur = SessionState(t, t, 1)
                case s if t - s.last > gapMs =>
                  closed += ClosedSession(userId,
                    new Timestamp(s.start), new Timestamp(s.last), s.n)
                  cur = SessionState(t, t, 1)
                case s => cur = s.copy(last = math.max(s.last, t), n = s.n + 1)
              }
            }
            state.update(cur)
            // clamp: a batch of only-late rows (all older than watermark -
            // gap) would otherwise set a timeout <= the current watermark,
            // which Spark rejects and fails the whole query
            state.setTimeoutTimestamp(
              math.max(cur.last + gapMs, state.getCurrentWatermarkMs() + 1))
            closed.result().iterator
          }
        })
  }

  case class Doc(key: String, docId: Long, ts: Timestamp)
  case class FirstSeen(key: String, docId: Long)

  /** Cross-batch exact dedup: emits only the first occurrence of each
    * key; duplicate arrivals (any later batch while the key is in
    * state) are dropped. Event-time TTL retires keys once the
    * watermark passes lastSeen + ttl, bounding the store by *active*
    * keys. (Event-time, not processing-time: a processing-time timeout
    * makes the micro-batch engine schedule no-data batches
    * continuously.) Input must carry a watermark on `ts`.
    */
  def dedupFirstSeen(docs: Dataset[Doc], ttlMs: Long): Dataset[FirstSeen] = {
    implicit val stateEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[FirstSeen]
    implicit val keyEnc = Encoders.STRING
    docs.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: String, rows: Iterator[Doc], state: GroupState[Long]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = rows.toSeq
            val maxTs = batch.map(_.ts.getTime).max
            // clamp for the same reason as sessionize: all-late batches
            // must not set a timeout at or below the current watermark
            val timeout =
              math.max(maxTs + ttlMs, state.getCurrentWatermarkMs() + 1)
            if (state.exists) {
              state.setTimeoutTimestamp(timeout)
              Iterator.empty // seen before — drop all duplicates
            } else {
              val first = batch.minBy(_.docId)
              state.update(first.docId)
              state.setTimeoutTimestamp(timeout)
              Iterator.single(FirstSeen(key, first.docId))
            }
          }
        })
  }
}
