package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** R25: funnel progression AT INGEST — A26's view→click→purchase
  * funnel fed continuously. The batch gate re-derives three stage
  * frames from complete history (first view, first click strictly
  * after it, first purchase strictly after that); the ingest form
  * carries each user's progression as ONE bounded state row — the
  * last-seen (ts, id) for the order contract plus up to three stage
  * timestamps — and emits a stage ADVANCE the moment it happens. A
  * stage advance is final under in-order delivery (nothing earlier
  * can still arrive), so the output is append-mode safe and the
  * downstream per-stage count is an order-free UPDATE aggregate: the
  * live funnel.
  *
  * Ordering: the R22 contract verbatim — within a trigger the group
  * sorts by (ts, event_id); across triggers the source delivers each
  * user in increasing order (tape order), ENFORCED loudly from kept
  * state. A production feed would add an event-time timeout to drop
  * completed/stale funnels; the state is already constant-size per
  * user, so the timeout bounds live users, not growth per user.
  *
  * Parity (StreamingSpec R25): over any trigger split, the advance
  * set equals the batch funnel's stage frames row for row. For
  * sources that only promise per-shard order under resharding/replay
  * (the reference replays with RANDOM partition keys,
  * KinesisPlayer.java:101-103), use [[StreamOoo.funnelAdvances]] —
  * watermark-buffered, order-tolerant, same output.
  */
object StreamFunnel {

  final case class Ev(user_id: Long, ts_micro: Long, event_id: Long,
    event_type: String)
  final case class Advance(user_id: Long, stage: String, ts_micro: Long)
  /** -1L = stage not reached; lastTs/lastId guard the order contract. */
  final case class St(lastTs: Long, lastId: Long, tView: Long,
    tClick: Long, tPurchase: Long)

  def advances(evs: Dataset[Ev]): Dataset[Advance] = {
    implicit val outEnc = Encoders.product[Advance]
    implicit val stEnc = Encoders.product[St]
    evs.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[St, Advance](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[St]) =>
          var st = state.getOption.getOrElse(St(Long.MinValue, Long.MinValue,
            -1L, -1L, -1L))
          val out = it.toList.sortBy(e => (e.ts_micro, e.event_id))
            .flatMap { e =>
              if (e.ts_micro < st.lastTs ||
                (e.ts_micro == st.lastTs && e.event_id <= st.lastId))
                throw new IllegalStateException(
                  s"user $uid event ${e.event_id} arrived at/behind " +
                    s"(${st.lastTs}, ${st.lastId}): the source violated " +
                    "the increasing-order contract")
              st = st.copy(lastTs = e.ts_micro, lastId = e.event_id)
              val adv = e.event_type match {
                case "view" if st.tView < 0 =>
                  st = st.copy(tView = e.ts_micro)
                  Some(Advance(uid, "viewed", e.ts_micro))
                case "click" if st.tView >= 0 && st.tClick < 0 &&
                  e.ts_micro > st.tView =>
                  st = st.copy(tClick = e.ts_micro)
                  Some(Advance(uid, "clicked", e.ts_micro))
                case "purchase" if st.tClick >= 0 && st.tPurchase < 0 &&
                  e.ts_micro > st.tClick =>
                  st = st.copy(tPurchase = e.ts_micro)
                  Some(Advance(uid, "purchased", e.ts_micro))
                case _ => None
              }
              adv
            }
          state.update(st)
          out.iterator
      }
  }
}
