package graft.vcr

import java.time.LocalDateTime

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Replay: tape → records → batched puts (reference: KinesisPlayer.java).
  *
  * The reference lists each day folder in `[start, end)` on the driver,
  * filters objects by last-modified, splits lines, Base64-decodes, and
  * re-emits in ≤500-record / ≤1 MB PutRecords batches. Spark-first:
  * the day loop + listing is a partition-pruned scan of the `dt=` Hive
  * layout (the planner prunes directories, no driver listing loop), the
  * line split/skip-empties/decode are codegen'd expressions, and batch
  * assembly is a per-partition fold — per-partition batching matches the
  * reference, whose batches never span S3 objects read on different
  * threads.
  */
object TapePlayer {

  /** Tape lines for `[start, effectiveEnd(start, end)]`, partition-pruned
    * by day (reference: KinesisPlayer.java:199-246). Columns:
    * `line STRING, dt STRING, src STRING (file), payload BINARY`.
    * Empty lines are skipped (reference: KinesisPlayer.java:170-172).
    */
  def read(spark: SparkSession, root: String, stream: String,
           start: LocalDateTime, end: Option[LocalDateTime]): DataFrame = {
    val endEff = TimeArg.effectiveEnd(start, end)
    val dir = s"$root/$stream"
    // read.text keeps the inferred dt= partition column, so the day-range
    // filter is partition pruning in the planner — the Spark form of the
    // reference's "list only day folders in range" loop.
    spark.read.option("basePath", dir).text(dir)
      .filter(col(Tape.DtCol) >= lit(start.toLocalDate.toString) &&
        col(Tape.DtCol) <= lit(endEff.toLocalDate.toString))
      .filter(length(col("value")) > 0)
      .select(
        col("value").as(Tape.LineCol),
        col(Tape.DtCol).cast("string").as(Tape.DtCol),
        input_file_name().as("src"),
        Tape.decodeLine(col("value")).as(Tape.PayloadCol))
  }

  /** Decoded payloads only (reference: objectToPayloads). */
  def payloads(spark: SparkSession, root: String, stream: String,
               start: LocalDateTime, end: Option[LocalDateTime]): DataFrame =
    read(spark, root, stream, start, end).select(Tape.PayloadCol)

  /** Assemble per-partition PutRecords batches and emit them through a
    * [[ReplaySink]], with partial-failure retry. Returns records sent.
    * Runs inside `foreachPartition` — no driver-side data movement.
    *
    * Each record carries a deterministic partition key
    * ([[PartitionKeys.forPayload]]; the reference attaches a random
    * UUID per record, KinesisPlayer.java:99-103). On partial failure
    * only the FAILED sub-records are retried — accepted records are
    * never re-sent (KinesisPlayer.java:131-144) — and a batch that
    * still fails at the retry deadline FAILS THE TASK rather than
    * being silently counted as sent.
    */
  def play(tape: DataFrame, sinkFactory: ReplaySinkFactory,
           maxCount: Int = KinesisBatcher.MaxBatchCount,
           maxBytes: Long = KinesisBatcher.MaxBatchBytes,
           retryTimeoutMillis: Long = 30000L): Long = {
    val spark = tape.sparkSession
    val sent = spark.sparkContext.longAccumulator("vcr.replay.sent")
    tape.select(Tape.PayloadCol).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        val sink = sinkFactory.open()
        try {
          KinesisBatcher.assemble(
            rows.map(_.getAs[Array[Byte]](0)), maxCount, maxBytes)
            .foreach { batch =>
              var pending = batch.payloads
                .map(p => ReplayRecord(PartitionKeys.forPayload(p), p))
              val done = Retry.withBackoff(
                () => {
                  val failedIdx = sink.putBatch(pending)
                  if (failedIdx.nonEmpty) {
                    pending = failedIdx.map(pending) // retry failures only
                    throw new PartialFailure(failedIdx.length)
                  }
                },
                retryOn = _.isInstanceOf[PartialFailure],
                timeoutMillis = retryTimeoutMillis)
              if (done.isEmpty)
                throw new ReplayExhausted(pending.length, retryTimeoutMillis)
              sent.add(batch.payloads.length.toLong)
            }
        } finally sink.close()
    }
    sent.value
  }

  final class PartialFailure(val failedCount: Int)
    extends RuntimeException(s"$failedCount records failed")

  /** A batch whose failed sub-records never drained within the retry
    * deadline — surfaced as a task failure, never dropped.
    */
  final class ReplayExhausted(val stillFailing: Int, timeoutMillis: Long)
    extends RuntimeException(
      s"$stillFailing records still failing after ${timeoutMillis} ms of retries")
}
