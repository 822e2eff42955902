package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming face of D10's incremental-ingest dedup ledger: the batch
  * query answers "how much of today's traffic is new?" over the whole
  * archive in one pass; this operator answers it CONTINUOUSLY as the
  * recorder appends — per arrival day: events, distinct payloads, and
  * payloads seen for the first time ever.
  *
  * Shape: one stateful pass keyed by the 16-byte payload hash
  * (`flatMapGroupsWithState`) annotates each record with two flags —
  * first occurrence of (hash, day) and first occurrence of hash EVER —
  * then one streaming aggregate per day sums them. State per hash is
  * its first-seen day plus the days already marked (bounded by the
  * archive's day count; a production deployment with a retention
  * horizon would evict via event-time timeout like R3's sessionizer).
  * The shuffle carries the hash, never payload bytes — D1/D10's rule.
  *
  * First-seen within a micro-batch is min(day) — the group is sorted
  * by day before state threads through it, so trigger packing (one
  * batch spanning several dt partitions on catch-up) never shifts
  * novelty to a later day. ACROSS batches it is arrival order (the
  * online ledger's only option); that equals the batch twin's
  * min(day) whenever batches arrive in day order — true for the tape,
  * whose replay order is (dt, firstSeq): the recorder wrote days in
  * arrival order (reference tape naming, InjectableS3Emitter.java:38-44).
  */
object StreamDedupLedger {

  final case class Rec(h: String, day: String)
  final case class Marked(day: String, first_in_day: Boolean, novel: Boolean)
  final case class LedgerState(first_day: String, days: Seq[String])

  /** Tape stream (or any frame with binary `payload` and day-partition
    * `dt`) → (hash, arrival day). The tape's `dt=` directory IS the
    * arrival day (reference tape naming), so no timestamp arithmetic.
    */
  def recs(tape: DataFrame): Dataset[Rec] = {
    implicit val enc = Encoders.product[Rec]
    tape.select(md5(col("payload")).as("h"),
      col("dt").cast("string").as("day"))
      .as[Rec]
  }

  /** Per-record first-seen flags from one pass of keyed state. */
  def annotate(recs: Dataset[Rec]): Dataset[Marked] = {
    implicit val markedEnc = Encoders.product[Marked]
    implicit val stateEnc = Encoders.product[LedgerState]
    recs.groupByKey(_.h)(Encoders.STRING)
      .flatMapGroupsWithState[LedgerState, Marked](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[Rec], state: GroupState[LedgerState]) =>
          var st = state.getOption
          // Spark guarantees only the grouping key, NOT within-key
          // order, so a micro-batch holding one hash across several
          // days (first batch, or a catch-up batch after restart)
          // must not credit novelty by iterator luck. Sorting the
          // group by day makes first-seen = min(day) over state+batch
          // — deterministic and equal to the batch twin by
          // construction, whatever the trigger packing. Within-day
          // order is immaterial: the flags are day-granular.
          val out = it.toList.sortBy(_.day).map { r =>
            st match {
              case None =>
                st = Some(LedgerState(r.day, Seq(r.day)))
                Marked(r.day, first_in_day = true, novel = true)
              case Some(s) if !s.days.contains(r.day) =>
                st = Some(s.copy(days = s.days :+ r.day))
                Marked(r.day, first_in_day = true, novel = false)
              case Some(_) =>
                Marked(r.day, first_in_day = false, novel = false)
            }
          }
          st.foreach(state.update)
          out.iterator
      }
  }

  /** The ledger: one row per day, continuously updated. Matches the
    * batch twin's (day, n_events, n_payloads, n_novel) schema.
    */
  def ledger(marked: Dataset[Marked]): DataFrame =
    marked.groupBy(col("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("first_in_day"), 1L).otherwise(0L)).as("n_payloads"),
        sum(when(col("novel"), 1L).otherwise(0L)).as("n_novel"))

  /** The composed streaming query over a tape stream. */
  def apply(tape: DataFrame): DataFrame = ledger(annotate(recs(tape)))

  /** The batch twin over the same tape read — D10's one-pass shape
    * (min() first-seen + day rollup), for parity specs.
    */
  def batchTwin(tape: DataFrame): DataFrame = {
    val ev = tape.select(md5(col("payload")).as("h"),
      col("dt").cast("string").as("day"))
    val firstSeen = ev.groupBy(col("h")).agg(min(col("day")).as("first_day"))
    ev.join(firstSeen, Seq("h"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("h")).as("n_payloads"),
        countDistinct(when(col("day") === col("first_day"), col("h")))
          .as("n_novel"))
  }
}
