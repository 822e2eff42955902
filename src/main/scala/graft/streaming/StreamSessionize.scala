package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** R3: stateful gap sessionization with `flatMapGroupsWithState` — the
  * streaming twin of AnalyticsQueries.qSessionize (same 30-min-gap
  * semantics), keyed by user with one compact state record per key.
  *
  * A session closes when a later event arrives past the gap (emitted
  * immediately) — the still-open tail session stays in state. Scale:
  * state is O(active keys), shuffled once on the grouping key;
  * watermark-driven timeouts would evict idle keys in production.
  */
object StreamSessionize {

  final case class Ev(user_id: Long, ts_us: Long)
  /** watermark-capable variant (event time as a real timestamp) */
  final case class TEv(user_id: Long, ts: Timestamp)
  final case class SessState(start_us: Long, last_us: Long, n: Long)
  final case class Session(user_id: Long, start_us: Long, end_us: Long,
                           n_events: Long)

  val DefaultGapUs: Long = 30L * 60 * 1000000

  def sessionize(events: Dataset[Ev],
                 gapUs: Long = DefaultGapUs): Dataset[Session] = {
    implicit val sessEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessState]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[SessState]) =>
          val sorted = evs.toSeq.sortBy(_.ts_us)
          var closed = List.empty[Session]
          var st = state.getOption
          sorted.foreach { e =>
            st match {
              case None =>
                st = Some(SessState(e.ts_us, e.ts_us, 1))
              case Some(s) if e.ts_us - s.last_us > gapUs =>
                closed ::= Session(uid, s.start_us, s.last_us, s.n)
                st = Some(SessState(e.ts_us, e.ts_us, 1))
              case Some(s) =>
                st = Some(s.copy(last_us = e.ts_us, n = s.n + 1))
            }
          }
          st.foreach(state.update)
          closed.reverse.iterator
      }
  }

  /** Production variant: sessions ALSO close when the event-time
    * watermark passes `last event + gap` — an idle user's tail session
    * flushes without waiting for their next event, and idle keys leave
    * the state store. Input must carry `withWatermark` on `ts`.
    */
  def sessionizeWithTimeout(events: Dataset[TEv],
                            gapUs: Long = DefaultGapUs): Dataset[Session] = {
    implicit val sessEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessState]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, evs: Iterator[TEv], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(uid, s.start_us, s.last_us, s.n))
          } else {
            val sorted = evs.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var st = state.getOption
            sorted.foreach { e =>
              val us = e.ts.getTime * 1000
              st match {
                case None => st = Some(SessState(us, us, 1))
                case Some(s) if us - s.last_us > gapUs =>
                  closed ::= Session(uid, s.start_us, s.last_us, s.n)
                  st = Some(SessState(us, us, 1))
                case Some(s) => st = Some(s.copy(last_us = us, n = s.n + 1))
              }
            }
            st.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.last_us + gapUs) / 1000)
            }
            closed.reverse.iterator
          }
      }
  }
}
