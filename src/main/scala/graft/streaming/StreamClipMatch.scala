package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** R31: clip identification AT INGEST — M12's constellation matcher
  * run continuously: arriving clips resolve against the corpus's
  * static fingerprint index the moment they land (the "name that
  * tune while it plays" deployment).
  *
  * Streaming shape: the index is the STATIC side of a stream-static
  * equi-join on the fingerprint key — built offline like the S27
  * artifact, corpus-sized, never broadcast; the clip side explodes to
  * its own fingerprints inside its own trigger, so the per-(clip,
  * track, offset) vote aggregate's update-mode emission is final per
  * key (the R23 argument), and the accumulated vote table is
  * BIT-IDENTICAL to the batch matcher under any trigger packing —
  * StreamingSpec R31 pins it, plus that the top vote per clip names
  * the planted source at the planted offset.
  */
object StreamClipMatch {

  /** Match a streaming (media_id, w ARRAY<STRING>) clip frame against
    * a static fingerprint index ((fkey, media_id, t1) — what
    * [[graft.media.MediaQueries.fingerprints]] emits over corpus
    * peaks): live (q_id, media_id, t_offset, votes) rows.
    */
  def resolve(index: DataFrame)(clips: DataFrame): DataFrame = {
    val clipFps = graft.media.MediaQueries.fingerprintsRowLocal(clips)
      .select(col("media_id").as("q_id"), col("fkey"),
        col("t1").as("tc"))
    clipFps.join(index, Seq("fkey"))
      .groupBy(col("q_id"), col("media_id"),
        (col("t1") - col("tc")).as("t_offset"))
      .agg(count(lit(1)).as("votes"))
  }
}
