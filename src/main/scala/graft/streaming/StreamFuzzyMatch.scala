package graft.streaming

import org.apache.spark.sql.DataFrame

/** R28: fuzzy-key entity resolution AT INGEST — D33's deletion-
  * neighborhood matcher run continuously: arriving (key, name)
  * records resolve against a static reference dictionary at edit
  * distance ≤ 1 the moment they land, the way a recorder would
  * canonicalize typo'd partition keys or entity names before
  * archiving.
  *
  * Streaming shape: the reference's variant index is the SMALL side
  * (the P25 decontamination asymmetry — broadcast however large the
  * stream), the probe side explodes to its own len+1 variants inside
  * its own trigger, and the join is STREAM-STATIC — no watermark, no
  * stream-stream buffering, no keyed state beyond the per-trigger
  * collapse aggregate whose update-mode emission is final per key
  * because every variant of a probe row lands in that row's trigger
  * (the R23 argument). So the accumulated stream output is
  * BIT-IDENTICAL to the batch matcher over the same tape under any
  * trigger packing — StreamingSpec R28 pins it.
  */
object StreamFuzzyMatch {

  /** Match a streaming (key, name) frame against a static reference
    * (ref_key, ref_name) dictionary: one row per (probe, ref) pair at
    * edit distance ≤ 1, with the variant-collision count alongside.
    */
  def resolve(ref: DataFrame)(probe: DataFrame): DataFrame =
    graft.dedup.DedupQueries.fuzzyMatchEd1(probe, ref)
}
