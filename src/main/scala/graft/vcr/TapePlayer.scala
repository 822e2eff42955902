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
    */
  def play(tape: DataFrame, sinkFactory: ReplaySinkFactory,
           maxCount: Int = KinesisBatcher.MaxBatchCount,
           maxBytes: Long = KinesisBatcher.MaxBatchBytes): Long = {
    val spark = tape.sparkSession
    val sent = spark.sparkContext.longAccumulator("vcr.replay.sent")
    tape.select(Tape.PayloadCol).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        val sink = sinkFactory.open()
        try {
          KinesisBatcher.assemble(
            rows.map(_.getAs[Array[Byte]](0)), maxCount, maxBytes)
            .foreach { batch =>
              Retry.withBackoff(
                () => {
                  val failed = sink.putBatch(batch.payloads)
                  if (failed > 0) throw new PartialFailure(failed)
                },
                retryOn = _.isInstanceOf[PartialFailure],
                timeoutMillis = 30000L)
              sent.add(batch.payloads.length.toLong)
            }
        } finally sink.close()
    }
    sent.value
  }

  final class PartialFailure(val failedCount: Int)
    extends RuntimeException(s"$failedCount records failed")
}
