package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Bloom-gated ingest dedup: D11's sketch rung composed INTO the
  * streaming exact path (R9) — the production reason the Bloom filter
  * exists. A continuously-ingesting archive already holds petabytes of
  * payloads; re-crawl/re-ingest traffic is dominated by payloads the
  * archive has seen. Gating each arrival on the archive's m/8-byte
  * Bloom filter (a broadcast literal, probe = pure codegen bit
  * arithmetic — no join, no shuffle) means:
  *
  *  - Bloom-NEGATIVE arrivals are DEFINITELY not archived: they skip
  *    the archive-index join entirely.
  *  - Bloom-POSITIVE arrivals (true dups + ε false positives) pay one
  *    exact stream-static join against the archive's hash index —
  *    a bucketed 16-byte-hash table at scale (E16), never payloads.
  *    Archived hits are dup verdicts and create NO keyed state.
  *  - Only NON-archived hashes (definite-new ∪ false positives) enter
  *    the flatMapGroupsWithState exact ledger — so the state store
  *    grows with the distinct NEW corpus, not with arrival count and
  *    not with the archive (the assertion the spec makes).
  *
  * Routing is CONSISTENT because the filter is static over the archive:
  * every arrival of a given hash probes the same way, so each hash
  * lives its whole life on one branch and every verdict is exact —
  * a false positive costs one extra index lookup, never a wrong
  * answer (the E23 contract). In-stream repeats of new payloads are
  * caught by the keyed ledger (first arrival novel, the rest dup),
  * with the group sorted by day before state threads through it, so
  * trigger packing never shifts novelty to a later day (R9's rule).
  *
  * Ledger schema per arrival day: n_events, n_definite_new (bloom
  * negatives), n_maybe (positives), n_archive_dups (exact hits),
  * n_fp_events (positives that missed the index — measured FPs),
  * n_novel (first-ever-seen payloads, archive included in "seen").
  * Per-day distinct counting of ARCHIVED payloads is deliberately not
  * here: that is R9's job (its state is per distinct hash); the gate's
  * job is novelty + dup verdicts with state ∝ the new corpus only.
  */
object StreamBloomGate {

  final case class GRec(h: String, day: String, maybe: Boolean)
  final case class GMark(day: String, maybe: Boolean, archived: Boolean,
                         novel: Boolean)
  final case class Seen(first_day: String)

  /** The gate's static side, built once from the archive tape:
    * the distinct-hash index (persisted — it feeds the Bloom build and
    * every micro-batch's exact join) and the m/64 filter words
    * (a bounded plan-time collect: m/8 bytes however large the
    * archive — the E23 idiom).
    */
  final case class Archive(words: Seq[Long], m: Int, k: Int,
                           hashes: DataFrame)

  def buildArchive(archiveTape: DataFrame,
                   m: Int = 1 << 16, k: Int = 4): Archive = {
    val hashes = graft.CachedFrames.persist(
      archiveTape.select(md5(col("payload")).as("h")).distinct())
    val words = hashes
      .agg(graft.functions.BloomFilterAgg(col("h"), m, k).as("bf"))
      .head().getSeq[Long](0).toVector
    Archive(words, m, k, hashes)
  }

  /** Per-arrival gated verdicts over a tape stream. */
  def verdicts(tapeStream: DataFrame, archive: Archive): Dataset[GMark] = {
    implicit val recEnc = Encoders.product[GRec]
    implicit val markEnc = Encoders.product[GMark]
    implicit val stateEnc = Encoders.product[Seen]
    val r = tapeStream
      .select(md5(col("payload")).as("h"),
        col("dt").cast("string").as("day"))
      .withColumn("__bf", typedLit(archive.words))
      .withColumn("maybe", graft.functions.BloomFilterAgg
        .probe("__bf", "h", archive.m, archive.k))
      .drop("__bf")
    // positives pay the one exact lookup; negatives never touch the
    // archive index
    val maybes = r.filter(col("maybe"))
      .join(archive.hashes.withColumn("archived", lit(true)),
        Seq("h"), "left_outer")
    val dups = maybes.filter(col("archived").isNotNull)
      .select(col("day"), col("maybe"), lit(true).as("archived"),
        lit(false).as("novel"))
      .as[GMark]
    // the keyed exact ledger sees ONLY non-archived hashes
    val fresh = r.filter(!col("maybe")).select(col("h"), col("day"),
        col("maybe"))
      .union(maybes.filter(col("archived").isNull)
        .select(col("h"), col("day"), col("maybe")))
      .as[GRec]
    val freshMarked = fresh.groupByKey(_.h)(Encoders.STRING)
      .flatMapGroupsWithState[Seen, GMark](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[GRec], state: GroupState[Seen]) =>
          // sort by day: first-seen = min(day) over state+batch
          // whatever the trigger packing (iterator order is not a
          // Spark guarantee — R9's rule)
          val out = it.toList.sortBy(_.day).map { g =>
            state.getOption match {
              case None =>
                state.update(Seen(g.day))
                GMark(g.day, g.maybe, archived = false, novel = true)
              case Some(_) =>
                GMark(g.day, g.maybe, archived = false, novel = false)
            }
          }
          out.iterator
      }
    dups.union(freshMarked)
  }

  /** The per-day gated ledger, continuously updated. */
  def ledger(v: Dataset[GMark]): DataFrame =
    v.groupBy(col("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(!col("maybe"), 1L).otherwise(0L)).as("n_definite_new"),
        sum(when(col("maybe"), 1L).otherwise(0L)).as("n_maybe"),
        sum(when(col("archived"), 1L).otherwise(0L)).as("n_archive_dups"),
        sum(when(col("maybe") && !col("archived"), 1L).otherwise(0L))
          .as("n_fp_events"),
        sum(when(col("novel"), 1L).otherwise(0L)).as("n_novel"))

  def apply(tapeStream: DataFrame, archive: Archive): DataFrame =
    ledger(verdicts(tapeStream, archive))

  /** Batch twin over the same (archive, stream) tapes — the same gated
    * semantics as two joins and an aggregate, for parity specs.
    */
  def batchTwin(archiveTape: DataFrame, streamTape: DataFrame,
                m: Int = 1 << 16, k: Int = 4): DataFrame = {
    val aH = archiveTape.select(md5(col("payload")).as("h")).distinct()
    val words = aH
      .agg(graft.functions.BloomFilterAgg(col("h"), m, k).as("bf"))
      .head().getSeq[Long](0).toVector
    val ev = streamTape
      .select(md5(col("payload")).as("h"),
        col("dt").cast("string").as("day"))
      .withColumn("__bf", typedLit(words))
      .withColumn("maybe",
        graft.functions.BloomFilterAgg.probe("__bf", "h", m, k))
      .drop("__bf")
      .join(aH.withColumn("archived", lit(true)), Seq("h"), "left_outer")
      .withColumn("archived", coalesce(col("archived"), lit(false)))
    val firstSeen = ev.filter(!col("archived"))
      .groupBy(col("h")).agg(min(col("day")).as("first_day"))
    ev.join(firstSeen, Seq("h"), "left_outer")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(!col("maybe"), 1L).otherwise(0L)).as("n_definite_new"),
        sum(when(col("maybe"), 1L).otherwise(0L)).as("n_maybe"),
        sum(when(col("archived"), 1L).otherwise(0L)).as("n_archive_dups"),
        sum(when(col("maybe") && !col("archived"), 1L).otherwise(0L))
          .as("n_fp_events"),
        countDistinct(when(!col("archived") &&
          col("day") === col("first_day"), col("h"))).as("n_novel"))
  }
}
