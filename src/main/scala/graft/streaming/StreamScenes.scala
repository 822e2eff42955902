package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** R20: shot/scene-boundary detection AT INGEST — M9's segmentation as
  * a continuous query over an arriving frame stream. A batch job can
  * lag() over the whole frame sequence; an ingest pipeline sees frames
  * trigger by trigger and must carry the comparison state across them:
  * per media, the keyed state is just (last frame idx, last frame
  * hash, scenes so far) — three fields per LIVE media however long the
  * stream runs, and a media's state is droppable the moment its
  * stream closes (frames per media are bounded; a production feed
  * would add an event-time timeout for that).
  *
  * Ordering: Spark guarantees only the grouping key, not within-key
  * order, so each micro-batch's group sorts by frame_idx before state
  * threads through it (the R9 lesson); ACROSS triggers the source must
  * deliver a media's frames in increasing frame order — tape order,
  * the same contract every resumable decoder gives. The contract is
  * ENFORCED, not assumed: the kept state carries the last frame index,
  * and a frame at or below it (out-of-order delivery, redelivery)
  * fails the query loudly instead of silently corrupting scene ids.
  * Under the contract the streamed assignment is BIT-IDENTICAL to the
  * batch M9 ledger for any trigger packing — the spec feeds the same
  * frames split 1/3 vs whole and compares scene-for-scene.
  */
object StreamScenes {

  final case class Frame(media_id: Long, frame_idx: Int, fhash: String)
  final case class SceneAssign(media_id: Long, frame_idx: Int,
    scene_id: Long, cut: Long, hamming: Long)
  final case class SceneState(lastIdx: Int, lastHash: String, scenes: Long)

  val CutBits: Int = graft.media.MediaQueries.SceneCutBits

  private[streaming] def hamming(a: String, b: String): Int = {
    var c = 0
    var i = 0
    while (i < a.length) { if (a.charAt(i) != b.charAt(i)) c += 1; i += 1 }
    c
  }

  /** Per-frame scene assignment over a streaming (media_id, frame_idx,
    * fhash) frame — append mode, state = one [[SceneState]] per media.
    */
  def assign(frames: Dataset[Frame]): Dataset[SceneAssign] = {
    implicit val outEnc = Encoders.product[SceneAssign]
    implicit val stEnc = Encoders.product[SceneState]
    frames.groupByKey(_.media_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SceneState, SceneAssign](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (media: Long, it: Iterator[Frame], state: GroupState[SceneState]) =>
          var st = state.getOption.getOrElse(SceneState(0, null, 0L))
          val out = it.toList.sortBy(_.frame_idx).map { f =>
            if (st.lastHash != null && f.frame_idx <= st.lastIdx)
              throw new IllegalStateException(
                s"media $media frame ${f.frame_idx} arrived at/behind " +
                  s"the last processed frame ${st.lastIdx}: the source " +
                  "violated the increasing-frame-order contract")
            val h = if (st.lastHash == null) -1L
              else hamming(st.lastHash, f.fhash).toLong
            val isCut = h < 0L || h > CutBits
            val scenes = if (isCut) st.scenes + 1 else st.scenes
            st = SceneState(f.frame_idx, f.fhash, scenes)
            SceneAssign(media, f.frame_idx, scenes,
              if (isCut) 1L else 0L, math.max(h, 0L))
          }
          state.update(st)
          out.iterator
      }
  }

  /** Batch twin over the same frame contract (delegates to M9). */
  def batchTwin(frames: DataFrame): DataFrame =
    graft.media.MediaQueries.scenesFromHashes(frames)
}
