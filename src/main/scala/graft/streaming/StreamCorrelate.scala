package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream correlation primitives (SURVEY §2.7 R5/R6).
  *
  * R5 `intervalJoin`: join two live streams on a key with a bounded
  * event-time interval (click within N minutes of its impression).
  * Both sides carry watermarks and the join condition bounds the
  * interval ABOVE AND BELOW, so Spark can evict buffered state as the
  * watermarks advance — the two ingredients that keep stream-stream
  * join state finite on an unbounded stream. Without the interval
  * bound the state store grows monotonically; that's the 100 TB/day
  * failure mode this operator exists to avoid.
  *
  * R6 `dedupWithinWatermark`: exactly-once-per-key emission under
  * at-least-once delivery. The tape replay source (R4) redelivers
  * records after a crash-recovery, and the reference's Kinesis
  * semantics are at-least-once end to end
  * (KinesisPlayer.java:120-155 retries sub-records) —
  * `dropDuplicatesWithinWatermark` keeps a key fingerprint only until
  * the watermark passes it, so replayed duplicates inside the horizon
  * collapse while state stays bounded.
  */
object StreamCorrelate {

  /** Inner interval join: rows of `right` within [left.ts, left.ts +
    * within] (both bounds inclusive) of a matching `left` row.
    * Timestamp columns must be distinctly named; the key column is
    * deduplicated in the output.
    */
  /** `joinType` "inner" or "left_outer": the outer form emits an
    * unmatched left row (null right columns) once the RIGHT watermark
    * passes left.ts + within — i.e. when no match can arrive anymore —
    * which is how "impressions that never converted" becomes a stream
    * instead of a daily batch reconciliation.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, within: String,
      watermark: String, joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      l(key) === r(key) &&
        r(rightTs) >= l(leftTs) &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $within"),
      joinType)
      .drop(r(key))
  }

  /** R26: stream-stream LEFT SEMI interval join — "impressions that
    * DID convert", as a stream, without carrying the right side's
    * columns: each left row is emitted AT MOST ONCE, on the first
    * arriving match inside its interval, and never again (the state
    * store remembers emitted left rows until the watermark passes
    * them). The inner form re-emits a left row per match — the semi
    * form is what feeds a downstream that must count converters, not
    * conversions. Same two state-boundedness ingredients as R5: both
    * watermarks + a two-sided event-time bound.
    */
  def intervalSemiJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, within: String,
      watermark: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      l(key) === r(key) &&
        r(rightTs) >= l(leftTs) &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $within"),
      "left_semi")
  }

  /** Watermark-bounded exact dedup on `keys`. */
  def dedupWithinWatermark(df: DataFrame, tsCol: String,
      watermark: String, keys: Seq[String]): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)
}
