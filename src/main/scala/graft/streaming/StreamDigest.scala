package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** R29: live archive digests at the recorder — V15's per-partition
  * integrity fingerprint maintained AS data lands, so a replica
  * compare never waits for a batch sweep: the digest table is current
  * at every trigger.
  *
  * Streaming shape: one UPDATE-mode keyed aggregate per day
  * partition; bit_xor and count/sum merge order-free, so the streamed
  * row per dt is bit-identical to the batch digest over the same tape
  * under any trigger packing (StreamingSpec R29). The contract xor
  * buys its cheapness with: NOT idempotent — a replayed record flips
  * the digest back out, by design (a double-write is corruption the
  * digest must see), which is why this face requires the
  * exactly-once sink semantics Structured Streaming's checkpointing
  * provides, where the HLL face (R13e) tolerates at-least-once.
  *
  * The record identity is caller-supplied (`rec`): the tape STREAM
  * source exposes (payload, dt) — per-record sequence rides inside
  * the payload envelope where a deployment needs it — so the caller
  * names whatever string uniquely identifies a record; V15's batch
  * gate uses `seq|payload` for the same reason.
  */
object StreamDigest {

  /** Fold a streaming frame carrying a `dt` partition column to live
    * (dt, n, payload_bytes, digest) rows; `rec` is the record's
    * identity string (hash AND byte-count source).
    */
  def digests(records: DataFrame, rec: Column): DataFrame = records
    .select(col(graft.vcr.Tape.DtCol),
      graft.dedup.Shingling.h60(rec).as("h"),
      octet_length(rec).as("b"))
    .groupBy(col(graft.vcr.Tape.DtCol))
    .agg(count(lit(1)).as("n"),
      sum(col("b")).as("payload_bytes"),
      expr("bit_xor(h)").as("digest"))
}
