package graft.vcr

import java.time.ZoneOffset

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Correctness-gate queries for the VCR surface (SURVEY §2.1), phrased
  * over the `events` table as the stream surrogate: `event_id` ≅ Kinesis
  * sequence number, `ts` ≅ arrival time, `props` ≅ record payload.
  * Each has a DuckDB oracle; the file-level behaviors (tape layout,
  * greedy byte-capped batching, sinks, retry) are ScalaTest-verified.
  */
object VcrQueries {

  private def eventsAsRecords(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
      col("event_id"),
      col("ts"),
      col("props"),
      Tape.dtOf(col("ts")).as(Tape.DtCol))

  /** V1: record → tape line (standard Base64, one line per record). */
  def vcrEncode(s: SparkSession, dir: String): DataFrame =
    eventsAsRecords(s, dir).select(
      col("event_id"),
      col(Tape.DtCol),
      Tape.encodeLine(col("props").cast("binary")).as("line"))
      .orderBy(col("event_id"))

  val vcrEncodeSql: String = """
    SELECT event_id, strftime(ts, '%Y-%m-%d') AS dt,
           to_base64(encode(props)) AS line
    FROM events ORDER BY event_id"""

  /** V2: tape line → payload; encode∘decode must be the identity. */
  def vcrDecode(s: SparkSession, dir: String): DataFrame =
    eventsAsRecords(s, dir).select(
      col("event_id"),
      Tape.decodeLine(Tape.encodeLine(col("props").cast("binary")))
        .cast("string").as("payload"))
      .orderBy(col("event_id"))

  val vcrDecodeSql: String =
    "SELECT event_id, props AS payload FROM events ORDER BY event_id"

  // Replay window for vcr_range: a mid-stream instant with no explicit
  // end — exercises the end := start + 1 day - 1 s defaulting and the
  // strictly-inside epoch-second filter (KinesisPlayer.java:203-215).
  private val rangeStart = java.time.LocalDateTime.of(2024, 1, 10, 12, 0, 0)
  private val rangeStartEpoch = rangeStart.toEpochSecond(ZoneOffset.UTC)
  private val rangeEndEpoch = TimeArg.effectiveEnd(rangeStart, None)
    .toEpochSecond(ZoneOffset.UTC)

  /** V5: range selection — what a `play 2024-01-10T12:00:00` would
    * replay, summarized per day partition.
    */
  def vcrRange(s: SparkSession, dir: String): DataFrame =
    eventsAsRecords(s, dir)
      .filter(unix_timestamp(col("ts")) > rangeStartEpoch &&
        unix_timestamp(col("ts")) < rangeEndEpoch)
      .groupBy(col(Tape.DtCol))
      .agg(
        count(lit(1)).as("n"),
        sum(octet_length(col("props"))).as("payload_bytes"),
        min(col("event_id")).as("first_seq"),
        max(col("event_id")).as("last_seq"))
      .orderBy(col(Tape.DtCol))

  val vcrRangeSql: String = s"""
    SELECT strftime(ts, '%Y-%m-%d') AS dt, count(*) AS n,
           sum(octet_length(encode(props)))::BIGINT AS payload_bytes,
           min(event_id) AS first_seq, max(event_id) AS last_seq
    FROM events
    WHERE floor(epoch(ts))::BIGINT > $rangeStartEpoch
      AND floor(epoch(ts))::BIGINT < $rangeEndEpoch
    GROUP BY 1 ORDER BY dt"""

  /** V6 (count-capped split; the greedy byte-capped variant is
    * KinesisBatcher + spec): per-day replay batches of ≤500 records in
    * sequence order, as the reference's OperatorBufferKinesisBatch
    * produces when no batch hits the byte cap.
    */
  def vcrBatch(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col(Tape.DtCol)).orderBy(col("event_id"))
    eventsAsRecords(s, dir)
      .withColumn("bid",
        ((row_number().over(w) - lit(1)) / lit(KinesisBatcher.MaxBatchCount))
          .cast("long"))
      .groupBy(col(Tape.DtCol), col("bid"))
      .agg(
        count(lit(1)).as("n"),
        sum(octet_length(col("props"))).as("bytes"),
        min(col("event_id")).as("first_seq"),
        max(col("event_id")).as("last_seq"))
      .orderBy(col(Tape.DtCol), col("bid"))
  }

  val vcrBatchSql: String = s"""
    WITH numbered AS (
      SELECT strftime(ts, '%Y-%m-%d') AS dt, event_id,
             octet_length(encode(props)) AS plen,
             row_number() OVER (PARTITION BY strftime(ts, '%Y-%m-%d')
                                ORDER BY event_id) AS rn
      FROM events)
    SELECT dt, ((rn - 1) // ${KinesisBatcher.MaxBatchCount})::BIGINT AS bid,
           count(*) AS n, sum(plen)::BIGINT AS bytes,
           min(event_id) AS first_seq, max(event_id) AS last_seq
    FROM numbered GROUP BY dt, bid ORDER BY dt, bid"""

  /** V8: per-day replay-time estimate over tape line sizes with the
    * reference's integer-division chain and humanized label
    * (KinesisVcr.java:76-100,132-148; 2 target shards, 1 MB/s each).
    */
  def vcrEstimate(s: SparkSession, dir: String): DataFrame = {
    val shards = 2
    val mins = (sum(octet_length(Tape.encodeLine(col("props").cast("binary")))
      + lit(1)) / lit(1000) / lit(1000) / lit(shards) / lit(60)).cast("long")
    eventsAsRecords(s, dir)
      .groupBy(col(Tape.DtCol))
      .agg(
        count(lit(1)).as("files"),
        sum(octet_length(Tape.encodeLine(col("props").cast("binary"))) + lit(1))
          .as("tape_bytes"),
        mins.as("est_minutes"))
      .withColumn("est_human",
        when(col("est_minutes") < 60, concat(col("est_minutes"), lit(" mins")))
          .when(col("est_minutes") / 60 < 24,
            concat((col("est_minutes") / 60).cast("long"), lit(" hours")))
          .when(col("est_minutes") / 60 / 24 < 30,
            concat((col("est_minutes") / 60 / 24).cast("long"), lit(" days")))
          .otherwise(concat((col("est_minutes") / 60 / 24 / 30).cast("long"),
            lit(" months"))))
      .orderBy(col(Tape.DtCol))
  }

  val vcrEstimateSql: String = """
    WITH sized AS (
      SELECT strftime(ts, '%Y-%m-%d') AS dt,
             length(to_base64(encode(props))) + 1 AS line_bytes
      FROM events),
    est AS (
      SELECT dt, count(*) AS files, sum(line_bytes)::BIGINT AS tape_bytes,
             (sum(line_bytes) // 1000 // 1000 // 2 // 60)::BIGINT AS est_minutes
      FROM sized GROUP BY dt)
    SELECT dt, files, tape_bytes, est_minutes,
           CASE WHEN est_minutes < 60 THEN est_minutes::VARCHAR || ' mins'
                WHEN est_minutes / 60 < 24
                  THEN (est_minutes // 60)::VARCHAR || ' hours'
                WHEN est_minutes / 60 / 24 < 30
                  THEN (est_minutes // 60 // 24)::VARCHAR || ' days'
                ELSE (est_minutes // 60 // 24 // 30)::VARCHAR || ' months'
           END AS est_human
    FROM est ORDER BY dt"""

  /** V15: per-partition archive digest — the integrity fingerprint a
    * replica compare reads INSTEAD of the data: each day partition
    * folds to (n, bytes, xor-of-record-hashes), so "are these two
    * archives identical?" costs one digest-table join however many
    * terabytes the tapes hold. The record hash keys on (seq | payload)
    * — a divergence in EITHER field flips the digest, and two
    * DIFFERENT records can't cancel (xor cancellation needs identical
    * hashes, i.e. identical records, which a tape's unique seq rules
    * out). bit_xor is commutative/associative — order-free like the
    * sketch merges, exactly reproducible in the oracle — but NOT
    * idempotent: a replayed record flips the digest back, which is
    * the POINT (a double-write is corruption a digest must see; the
    * R29 face documents the exactly-once contract this implies).
    */
  def vcrDigest(s: SparkSession, dir: String): DataFrame =
    eventsAsRecords(s, dir)
      .select(col(Tape.DtCol),
        graft.dedup.Shingling.h60(concat(col("event_id").cast("string"),
          lit("|"), col("props"))).as("h"),
        octet_length(col("props")).as("b"))
      .groupBy(col(Tape.DtCol))
      .agg(count(lit(1)).as("n"),
        sum(col("b")).as("payload_bytes"),
        expr("bit_xor(h)").as("digest"))
      .orderBy(col(Tape.DtCol))

  val vcrDigestSql: String = """
    SELECT strftime(ts, '%Y-%m-%d') AS dt, count(*) AS n,
           sum(octet_length(encode(props)))::BIGINT AS payload_bytes,
           bit_xor(('0x' || substring(md5(event_id::VARCHAR || '|' ||
             props), 1, 15))::BIGINT)::BIGINT AS digest
    FROM events GROUP BY 1 ORDER BY dt"""

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "vcr_encode" -> (vcrEncode _),
    "vcr_digest" -> (vcrDigest _),
    "vcr_decode" -> (vcrDecode _),
    "vcr_range" -> (vcrRange _),
    "vcr_batch" -> (vcrBatch _),
    "vcr_estimate" -> (vcrEstimate _))

  def oracles: Map[String, String] = Map(
    "vcr_encode" -> vcrEncodeSql,
    "vcr_digest" -> vcrDigestSql,
    "vcr_decode" -> vcrDecodeSql,
    "vcr_range" -> vcrRangeSql,
    "vcr_batch" -> vcrBatchSql,
    "vcr_estimate" -> vcrEstimateSql)
}
