package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** R22: behavioral transition pairs AT INGEST — A53's Markov matrix
  * fed continuously. The batch gate lags over complete per-user
  * histories; an ingest pipeline sees events trigger by trigger and
  * carries exactly ONE fact per user across them: the last event seen
  * (its time, id, type) — constant state per live user, droppable on
  * an event-time timeout in a production feed. Each arrival then emits
  * its (prev → next) transition immediately, so the downstream count
  * aggregate (an UPDATE-mode groupBy, order-free) tracks the live
  * transition matrix.
  *
  * Ordering: within a trigger the group sorts by (ts, event_id) — the
  * R9 rule — and ACROSS triggers the source must deliver each user's
  * events in increasing (ts, event_id) order (tape order). The
  * contract is ENFORCED from kept state: a regressed or redelivered
  * event fails the query loudly rather than silently fabricating
  * transitions. Under the contract the emitted pair multiset is
  * exactly the batch lag's — the spec's claim. For sources that only
  * promise per-shard order under resharding/replay (the reference
  * replays with RANDOM partition keys, KinesisPlayer.java:101-103),
  * use [[StreamOoo.transitionPairs]] — watermark-buffered, order-
  * tolerant, same output.
  */
object StreamTransitions {

  final case class Ev(user_id: Long, ts_micro: Long, event_id: Long,
    event_type: String)
  final case class Trans(user_id: Long, event_id: Long,
    prev_type: String, next_type: String)
  final case class LastEv(tsMicro: Long, eventId: Long, lastType: String)

  def pairs(evs: Dataset[Ev]): Dataset[Trans] = {
    implicit val outEnc = Encoders.product[Trans]
    implicit val stEnc = Encoders.product[LastEv]
    evs.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[LastEv, Trans](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[LastEv]) =>
          var st = state.getOption.orNull
          val out = it.toList.sortBy(e => (e.ts_micro, e.event_id))
            .flatMap { e =>
              if (st != null && (e.ts_micro < st.tsMicro ||
                (e.ts_micro == st.tsMicro && e.event_id <= st.eventId)))
                throw new IllegalStateException(
                  s"user $uid event ${e.event_id} arrived at/behind " +
                    s"(${st.tsMicro}, ${st.eventId}): the source violated " +
                    "the increasing-order contract")
              val t = if (st == null) None
                else Some(Trans(uid, e.event_id, st.lastType, e.event_type))
              st = LastEv(e.ts_micro, e.event_id, e.event_type)
              t
            }
          state.update(st)
          out.iterator
      }
  }
}
