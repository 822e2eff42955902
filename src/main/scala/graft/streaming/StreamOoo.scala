package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Out-of-order-tolerant variants of R22/R25 (round-8 item: the
  * in-order forms enforce a per-key increasing-(ts, event_id) arrival
  * contract that a real at-least-once feed cannot promise — the
  * reference's own replay randomizes partition keys
  * (KinesisPlayer.java:101-103), so per-key order survives only by
  * luck of shard assignment).
  *
  * Mechanics: WATERMARK-DELAYED EMISSION. Each key buffers arrivals in
  * state; once the watermark passes an event's time, no earlier event
  * can still arrive (Spark drops later-than-watermark stragglers
  * before the stateful operator), so the buffered prefix strictly
  * below the watermark is emitted in event-time order and removed.
  * An event-time timeout re-flushes a key when the watermark advances
  * past its pending events even if no new data arrives for that key.
  * State per key is O(events inside one watermark window) — bounded by
  * the delay × the key's rate, not by history — and AGGREGATE state is
  * bounded too: a drained key idle past [[DefaultIdleMs]] of event
  * time is removed (see `armTimeout`), so the store holds O(keys
  * active within the horizon), not O(keys ever seen). Duplicate
  * deliveries (same event_id still pending, or at/behind the emitted
  * frontier) drop silently — at-least-once in, exactly-once out.
  *
  * Under any arrival interleaving whose per-key displacement stays
  * inside the watermark delay, the emitted multiset equals the batch
  * twin's exactly (StreamingSpec R22b/R25b feed a deliberately
  * shuffled interleaving).
  */
object StreamOoo {

  /** A buffered event: the (ts, id) pair is the event-time order. */
  final case class PendEv(ts_micro: Long, event_id: Long,
    event_type: String)

  /** Input row after the watermark column attach. */
  final case class EvT(user_id: Long, ts_micro: Long, event_id: Long,
    event_type: String, ts: java.sql.Timestamp)

  /** Dedupe + frontier-drop arrivals, merge into the pending buffer,
    * and split at the watermark: (ready-in-event-time-order, rest).
    */
  private def merge(pending: Seq[PendEv], arrivals: Seq[PendEv],
                    emTs: Long, emId: Long,
                    wmMicro: Long): (Seq[PendEv], Seq[PendEv]) = {
    val seen = pending.iterator.map(_.event_id).toSet
    val fresh = arrivals
      .filter(e => !seen.contains(e.event_id) &&
        (e.ts_micro > emTs || (e.ts_micro == emTs && e.event_id > emId)))
      .distinctBy(_.event_id)
    val all = (pending ++ fresh).sortBy(e => (e.ts_micro, e.event_id))
    all.partition(_.ts_micro < wmMicro)
  }

  /** Event-time horizon after which a DRAINED key's state is dropped:
    * 30 days of event time past its last emitted event. Bounds
    * aggregate state at O(keys active within the horizon) instead of
    * O(distinct keys ever seen). Dropping is safe against duplicates —
    * every emitted event is behind the watermark by then, so a
    * redelivery is dropped upstream before the stateful operator —
    * and costs only the chain restart: a key returning after 30 quiet
    * days starts a fresh transition chain / funnel, the same trade
    * every TTL'd session store makes. Feeds whose per-key quiet gaps
    * stay under the horizon match the batch twin exactly (the parity
    * specs); the horizon is a parameter for feeds that need otherwise.
    * Exception: `sceneAssignments` never fully removes — its expiry
    * keeps an O(1) tombstone with the scene-id high-water mark,
    * because restarted scene numbering would COLLIDE with the same
    * media's earlier ids rather than just restart a chain (see the
    * expiry branch there).
    */
  val DefaultIdleMs: Long = 30L * 24 * 3600 * 1000

  /** Register a re-flush for the earliest still-pending event; with
    * nothing pending, arm the idle-expiry instead — when IT fires with
    * still nothing new, the key's state is removed.
    */
  private def armTimeout[S](state: GroupState[S], rest: Seq[PendEv],
                            emTs: Long, idleMs: Long): Unit =
    if (rest.nonEmpty)
      state.setTimeoutTimestamp(math.max(
        rest.head.ts_micro / 1000L + 1L,
        state.getCurrentWatermarkMs() + 1L))
    else
      state.setTimeoutTimestamp(math.max(
        emTs / 1000L + idleMs,
        state.getCurrentWatermarkMs() + 1L))

  private def watermarked(evs: Dataset[_], delay: String): Dataset[EvT] = {
    implicit val enc = Encoders.product[EvT]
    evs.toDF()
      .withColumn("ts", expr("timestamp_micros(ts_micro)"))
      .withWatermark("ts", delay)
      .as[EvT]
  }

  final case class TransSt(pending: Seq[PendEv], emTs: Long, emId: Long,
    lastType: String, hasLast: Boolean)

  /** R22b: transition pairs at ingest, order-tolerant. Emission is the
    * in-order R22 fold over the watermark-released prefix.
    */
  def transitionPairs(evs: Dataset[StreamTransitions.Ev], delay: String,
                      idleMs: Long = DefaultIdleMs)
  : Dataset[StreamTransitions.Trans] = {
    implicit val outEnc = Encoders.product[StreamTransitions.Trans]
    implicit val stEnc = Encoders.product[TransSt]
    watermarked(evs, delay)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[TransSt, StreamTransitions.Trans](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[EvT], state: GroupState[TransSt]) =>
          val st = state.getOption.getOrElse(
            TransSt(Seq.empty, Long.MinValue, Long.MinValue, "", false))
          val wmMicro = state.getCurrentWatermarkMs() * 1000L
          val arrivals = it.map(e =>
            PendEv(e.ts_micro, e.event_id, e.event_type)).toSeq
          val (ready, rest) =
            merge(st.pending, arrivals, st.emTs, st.emId, wmMicro)
          if (arrivals.isEmpty && ready.isEmpty && rest.isEmpty &&
            state.hasTimedOut) {
            // the idle-expiry fired with nothing new: drop the key
            state.remove()
            Iterator.empty
          } else {
            var lastType = st.lastType
            var hasLast = st.hasLast
            val out = ready.flatMap { e =>
              val t = if (hasLast)
                Some(StreamTransitions.Trans(uid, e.event_id, lastType,
                  e.event_type))
              else None
              lastType = e.event_type; hasLast = true
              t
            }
            val (emTs, emId) =
              if (ready.nonEmpty) (ready.last.ts_micro, ready.last.event_id)
              else (st.emTs, st.emId)
            state.update(TransSt(rest, emTs, emId, lastType, hasLast))
            armTimeout(state, rest, emTs, idleMs)
            out.iterator
          }
      }
  }

  final case class SceneOooSt(pending: Seq[PendEv], emTs: Long,
    emId: Long, lastIdx: Long, lastHash: String, scenes: Long)

  /** R20b: scene-boundary detection, order-tolerant — the escape hatch
    * for R20's ENFORCED increasing-frame-order contract, which a tape
    * replayed through random partition keys
    * (reference KinesisPlayer.java:101-103) cannot promise. Frame
    * index IS the event time (1 frame ≡ 1 second, so `delay` = the
    * tolerated frame displacement): frames buffer per media, the
    * watermark-released prefix threads through the R20 hamming fold in
    * frame order, and emitted assignments are final because no earlier
    * frame can still arrive. Redelivered frames at/behind the emitted
    * frontier drop silently instead of failing the query.
    */
  def sceneAssignments(frames: Dataset[StreamScenes.Frame], delay: String,
                       idleMs: Long = DefaultIdleMs)
  : Dataset[StreamScenes.SceneAssign] = {
    implicit val outEnc = Encoders.product[StreamScenes.SceneAssign]
    implicit val stEnc = Encoders.product[SceneOooSt]
    val evs = frames.toDF().select(
      col("media_id").as("user_id"),
      (col("frame_idx").cast("long") * lit(1000000L)).as("ts_micro"),
      col("frame_idx").cast("long").as("event_id"),
      col("fhash").as("event_type"))
    watermarked(evs, delay)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SceneOooSt, StreamScenes.SceneAssign](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (media: Long, it: Iterator[EvT], state: GroupState[SceneOooSt]) =>
          val st = state.getOption.getOrElse(
            SceneOooSt(Seq.empty, Long.MinValue, Long.MinValue, -1L,
              null, 0L))
          val wmMicro = state.getCurrentWatermarkMs() * 1000L
          val arrivals = it.map(e =>
            PendEv(e.ts_micro, e.event_id, e.event_type)).toSeq
          val (ready, rest) =
            merge(st.pending, arrivals, st.emTs, st.emId, wmMicro)
          if (arrivals.isEmpty && ready.isEmpty && rest.isEmpty &&
            state.hasTimedOut) {
            // Idle-expiry sheds the buffer but KEEPS a minimal
            // tombstone carrying the scenes high-water mark and the
            // emitted frontier. Removing the state outright (the
            // transition/funnel trade) would restart scene numbering
            // at 1, and a media resuming past the horizon would emit
            // scene_ids that COLLIDE with its own earlier scenes —
            // downstream grouping by (media, scene_id) silently merges
            // distinct scenes, unlike a restarted chain which merely
            // loses one edge. lastHash=null forces the resume frame to
            // open a fresh scene at high-water+1. No timeout re-armed:
            // the tombstone is payload-bytes O(1) per media ever seen,
            // the buffers (the unbounded part) are gone.
            state.update(SceneOooSt(Seq.empty, st.emTs, st.emId, -1L,
              null, st.scenes))
            Iterator.empty
          } else {
            var lastIdx = st.lastIdx
            var lastHash = st.lastHash
            var scenes = st.scenes
            val out = ready.map { e =>
              val h = if (lastHash == null) -1L
                else StreamScenes.hamming(lastHash, e.event_type).toLong
              val isCut = h < 0L || h > StreamScenes.CutBits
              scenes = if (isCut) scenes + 1 else scenes
              lastIdx = e.event_id
              lastHash = e.event_type
              StreamScenes.SceneAssign(media, e.event_id.toInt, scenes,
                if (isCut) 1L else 0L, math.max(h, 0L))
            }
            val (emTs, emId) =
              if (ready.nonEmpty) (ready.last.ts_micro, ready.last.event_id)
              else (st.emTs, st.emId)
            state.update(
              SceneOooSt(rest, emTs, emId, lastIdx, lastHash, scenes))
            armTimeout(state, rest, emTs, idleMs)
            out.iterator
          }
      }
  }

  /** R3b input: sessionization under at-least-once needs an event
    * identity for the redelivery dedup; the in-order R3 keys on
    * timestamps alone. */
  final case class SessEv(user_id: Long, ts_micro: Long, event_id: Long)

  final case class SessOooSt(pending: Seq[PendEv], emTs: Long, emId: Long,
    start: Long, last: Long, n: Long, open: Boolean)

  /** R3b: gap sessionization, order-tolerant AND complete — the R22b
    * buffer in front of R3's fold, plus the watermark gap closure: once
    * the watermark passes `last event + gap` with nothing buffered, no
    * event can ever land inside the tail session (later-than-watermark
    * stragglers drop upstream), so the tail emits FINAL — every session
    * is eventually emitted exactly once, which is full parity with the
    * batch q_sessionize over any bounded-displacement interleaving.
    */
  def sessionsOoo(evs: Dataset[SessEv], delay: String,
                  gapUs: Long = StreamSessionize.DefaultGapUs,
                  idleMs: Long = DefaultIdleMs)
  : Dataset[StreamSessionize.Session] = {
    implicit val outEnc = Encoders.product[StreamSessionize.Session]
    implicit val stEnc = Encoders.product[SessOooSt]
    val in = evs.toDF().select(col("user_id"), col("ts_micro"),
      col("event_id"), lit("e").as("event_type"))
    watermarked(in, delay)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessOooSt, StreamSessionize.Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[EvT], state: GroupState[SessOooSt]) =>
          val st = state.getOption.getOrElse(
            SessOooSt(Seq.empty, Long.MinValue, Long.MinValue,
              0L, 0L, 0L, false))
          val wmMicro = state.getCurrentWatermarkMs() * 1000L
          val arrivals = it.map(e =>
            PendEv(e.ts_micro, e.event_id, e.event_type)).toSeq
          val (ready, rest) =
            merge(st.pending, arrivals, st.emTs, st.emId, wmMicro)
          if (arrivals.isEmpty && ready.isEmpty && rest.isEmpty &&
            state.hasTimedOut && !st.open) {
            state.remove()
            Iterator.empty
          } else {
            var (start, last, n, open) = (st.start, st.last, st.n, st.open)
            var closed = List.empty[StreamSessionize.Session]
            ready.foreach { e =>
              if (!open) {
                start = e.ts_micro; last = e.ts_micro; n = 1L; open = true
              } else if (e.ts_micro - last > gapUs) {
                closed ::= StreamSessionize.Session(uid, start, last, n)
                start = e.ts_micro; last = e.ts_micro; n = 1L
              } else {
                last = e.ts_micro; n += 1L
              }
            }
            // gap closure: nothing buffered and the watermark is past
            // last+gap — the tail session can never grow again
            if (open && rest.isEmpty && wmMicro > last + gapUs) {
              closed ::= StreamSessionize.Session(uid, start, last, n)
              open = false
            }
            val (emTs, emId) =
              if (ready.nonEmpty) (ready.last.ts_micro, ready.last.event_id)
              else (st.emTs, st.emId)
            state.update(SessOooSt(rest, emTs, emId, start, last, n, open))
            if (rest.nonEmpty) armTimeout(state, rest, emTs, idleMs)
            else if (open) state.setTimeoutTimestamp(math.max(
              (last + gapUs) / 1000L + 1L,
              state.getCurrentWatermarkMs() + 1L))
            else armTimeout(state, Seq.empty, emTs, idleMs)
            closed.reverse.iterator
          }
      }
  }

  final case class FunSt(pending: Seq[PendEv], emTs: Long, emId: Long,
    tView: Long, tClick: Long, tPurchase: Long)

  /** R25b: funnel advances at ingest, order-tolerant. Emission is the
    * in-order R25 fold (first view, first click strictly after it,
    * first purchase strictly after that) over the released prefix — an
    * advance is final because nothing earlier can still arrive.
    */
  def funnelAdvances(evs: Dataset[StreamFunnel.Ev], delay: String,
                     idleMs: Long = DefaultIdleMs)
  : Dataset[StreamFunnel.Advance] = {
    implicit val outEnc = Encoders.product[StreamFunnel.Advance]
    implicit val stEnc = Encoders.product[FunSt]
    watermarked(evs, delay)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[FunSt, StreamFunnel.Advance](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[EvT], state: GroupState[FunSt]) =>
          var st = state.getOption.getOrElse(
            FunSt(Seq.empty, Long.MinValue, Long.MinValue, -1L, -1L, -1L))
          val wmMicro = state.getCurrentWatermarkMs() * 1000L
          val arrivals = it.map(e =>
            PendEv(e.ts_micro, e.event_id, e.event_type)).toSeq
          val (ready, rest) =
            merge(st.pending, arrivals, st.emTs, st.emId, wmMicro)
          if (arrivals.isEmpty && ready.isEmpty && rest.isEmpty &&
            state.hasTimedOut) {
            // the idle-expiry fired with nothing new: drop the key
            state.remove()
            Iterator.empty
          } else {
            val out = ready.flatMap { e =>
              e.event_type match {
                case "view" if st.tView < 0 =>
                  st = st.copy(tView = e.ts_micro)
                  Some(StreamFunnel.Advance(uid, "viewed", e.ts_micro))
                case "click" if st.tView >= 0 && st.tClick < 0 &&
                  e.ts_micro > st.tView =>
                  st = st.copy(tClick = e.ts_micro)
                  Some(StreamFunnel.Advance(uid, "clicked", e.ts_micro))
                case "purchase" if st.tClick >= 0 && st.tPurchase < 0 &&
                  e.ts_micro > st.tClick =>
                  st = st.copy(tPurchase = e.ts_micro)
                  Some(StreamFunnel.Advance(uid, "purchased", e.ts_micro))
                case _ => None
              }
            }
            val (emTs, emId) =
              if (ready.nonEmpty) (ready.last.ts_micro, ready.last.event_id)
              else (st.emTs, st.emId)
            state.update(st.copy(pending = rest, emTs = emTs, emId = emId))
            armTimeout(state, rest, emTs, idleMs)
            out.iterator
          }
      }
  }
}
