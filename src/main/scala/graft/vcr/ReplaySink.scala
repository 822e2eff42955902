package graft.vcr

import java.nio.file.{Files, Paths, StandardOpenOption}
import java.security.MessageDigest

/** One replayed record: partition key + payload, like a
  * PutRecordsRequestEntry (reference: KinesisPlayer.java:99-103).
  */
final case class ReplayRecord(key: String, payload: Array[Byte])

/** Where replayed batches land (reference emits PutRecords to Kinesis —
  * an AWS dependency this environment doesn't ship). The trait is the
  * seam: [[KinesisReplaySink]] speaks the PutRecords contract against a
  * [[KinesisEndpoint]]; tests also use [[DirectoryReplaySink]].
  *
  * Implementations are constructed per partition via
  * [[ReplaySinkFactory]] (must be Serializable — it travels to tasks).
  */
trait ReplaySink extends AutoCloseable {
  /** Emit one batch; return the INDICES of records that failed (empty =
    * all accepted), so the caller retries exactly those sub-records —
    * never the whole batch (reference: KinesisPlayer.java:120-155).
    */
  def putBatch(records: Array[ReplayRecord]): Array[Int]
  override def close(): Unit = ()
}

trait ReplaySinkFactory extends Serializable {
  def open(): ReplaySink
}

/** Deterministic partition key for a replayed record. The reference uses
  * a random UUID per record to spread load across shards
  * (KinesisPlayer.java:101-103); md5 of the payload spreads identically
  * but keeps replay reproducible for the correctness gate.
  */
object PartitionKeys {
  def forPayload(payload: Array[Byte]): String = {
    val d = MessageDigest.getInstance("MD5").digest(payload)
    d.map("%02x".format(_)).mkString
  }
}

/** Test/local sink: each batch becomes one file of newline-delimited
  * payloads under `dir` — a "stream" that tests can read back.
  */
final class DirectoryReplaySink(dir: String) extends ReplaySink {
  private var n = 0
  override def putBatch(records: Array[ReplayRecord]): Array[Int] = {
    val id = java.util.UUID.randomUUID().toString
    val out = Paths.get(dir, s"batch-$id-$n")
    n += 1
    val bytes = records.map(r => r.payload :+ '\n'.toByte).flatten
    Files.write(out, bytes.toArray[Byte], StandardOpenOption.CREATE)
    Array.empty
  }
}

final case class DirectoryReplaySinkFactory(dir: String) extends ReplaySinkFactory {
  override def open(): ReplaySink = {
    Files.createDirectories(Paths.get(dir))
    new DirectoryReplaySink(dir)
  }
}
