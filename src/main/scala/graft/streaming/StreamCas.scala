package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** R18: streaming CAS chunk dedup — the write-once decision of M5's
  * content-addressed store made AT INGEST, which is where a blob lake
  * actually makes it: as payloads arrive, each fixed-window chunk is
  * admitted against keyed state per chunk hash, and `stored = true` is
  * emitted EXACTLY ONCE per distinct chunk across the whole stream —
  * every later occurrence is a reference to the stored copy. The batch
  * M5 rollup answers "which chunks were duplicated" after the fact;
  * this answers "do I need to store these bytes" before writing them,
  * the difference between a dedup REPORT and a dedup STORE.
  *
  * Shape: chunking is the M5 cut rule verbatim (char windows of the
  * decoded payload, md5 per chunk — a stateless narrow projection), so
  * the only stream-specific machinery is one `flatMapGroupsWithState`
  * keyed by the 16-byte chunk hash. State per hash = (keeper, n_refs):
  * two longs, bounded by the DISTINCT chunk count — never by arrivals.
  * The shuffle carries hashes, never chunk bytes (D1's rule). Groups
  * sort by media id before state threads through (the R9 lesson:
  * Spark does not order within a key), so keeper attribution is
  * deterministic under any trigger packing and equals the batch twin's
  * min(media_id) whenever the tape replays in media order.
  */
object StreamCas {

  /** M5's window width (chars of decoded payload per chunk). */
  val ChunkChars = 100

  final case class Chunk(h: String, media_id: Long)
  final case class Verdict(h: String, media_id: Long, chunk_idx: Int,
                           stored: Boolean)
  final case class CasState(keeper: Long, n_refs: Long)

  /** (media_id, text) frame → chunk references. Cut rule identical to
    * M5: char windows over the decoded text, counted from char_length
    * so multibyte payloads never emit trailing empty chunks. Callers
    * adapt the tape (payload parse) upstream — the tape record carries
    * only file-level seq ranges, so media identity rides the payload,
    * the R16 convention.
    */
  def chunks(media: DataFrame): Dataset[Chunk] = {
    implicit val enc = Encoders.product[Chunk]
    media.select(col("media_id"), col("text"))
      .withColumn("n_chunks",
        expr(s"cast((length(text) + ${ChunkChars - 1}) div $ChunkChars as int)"))
      .select(col("media_id"),
        explode(expr("sequence(1, n_chunks)")).as("k"), col("text"))
      .select(
        md5(substring(col("text"), (col("k") - 1) * ChunkChars + 1,
          lit(ChunkChars)).cast("binary")).as("h"),
        col("media_id"))
      .as[Chunk]
  }

  /** One keyed-state pass: the write-once admission verdict per chunk
    * occurrence. chunk_idx counts the occurrence ordinal within this
    * group's sorted batch slice (diagnostic only — parity checks key
    * on (h, media_id, stored)).
    */
  def annotate(chunks: Dataset[Chunk]): Dataset[Verdict] = {
    implicit val verdictEnc = Encoders.product[Verdict]
    implicit val stateEnc = Encoders.product[CasState]
    chunks.groupByKey(_.h)(Encoders.STRING)
      .flatMapGroupsWithState[CasState, Verdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (h: String, it: Iterator[Chunk], state: GroupState[CasState]) =>
          var st = state.getOption
          var idx = 0
          val out = it.toList.sortBy(_.media_id).map { c =>
            idx += 1
            st match {
              case None =>
                st = Some(CasState(c.media_id, 1L))
                Verdict(h, c.media_id, idx, stored = true)
              case Some(s) =>
                st = Some(s.copy(n_refs = s.n_refs + 1L))
                Verdict(h, c.media_id, idx, stored = false)
            }
          }
          st.foreach(state.update)
          out.iterator
      }
  }
}
