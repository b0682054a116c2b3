package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization: the incremental form of
  * [[graft.operators.Relational.sessionize]] via
  * `flatMapGroupsWithState` — per-key session state lives in the state
  * store, a closed session (inter-event gap > `gapUs`) is emitted as soon
  * as the event that closes it arrives. Same session contract as the
  * batch/oracle form; the open tail session stays in state until closed
  * (or a timeout policy evicts it — NoTimeout here, ProcessingTime/
  * EventTime timeouts plug into the same hook in production).
  *
  * Scale: state is O(active keys), shuffled once by key; this is the
  * pattern the reference's upsert-by-key sidesteps (late records are
  * ordinary updates there — SURVEY §2.3) but a real event pipeline needs.
  */
object Sessionization {

  final case class SessionState(
      sessionId: Long, start: Long, lastTs: Long, count: Long)

  final case class SessionOut(
      user_id: Long, session_id: Long, n_events: Long,
      session_start: Long, session_end: Long)

  /** input: (user_id, ts_us) pairs, possibly unordered within a batch. */
  def sessionize(
      events: Dataset[(Long, Long)],
      gapUs: Long = 3600L * 1000 * 1000): Dataset[SessionOut] = {
    import events.sparkSession.implicits._

    def update(
        userId: Long,
        rows: Iterator[(Long, Long)],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      val sorted = rows.map(_._2).toArray.sorted
      var closed = List.empty[SessionOut]
      var st = state.getOption
      sorted.foreach { t =>
        st match {
          case None =>
            st = Some(SessionState(1L, t, t, 1L))
          case Some(s) if t - s.lastTs > gapUs =>
            closed ::= SessionOut(userId, s.sessionId, s.count, s.start, s.lastTs)
            st = Some(SessionState(s.sessionId + 1, t, t, 1L))
          case Some(s) =>
            st = Some(s.copy(lastTs = t, count = s.count + 1))
        }
      }
      st.foreach(state.update)
      closed.reverse.iterator
    }

    events
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }
}
