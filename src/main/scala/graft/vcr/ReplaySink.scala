package graft.vcr

import java.nio.file.{Files, Paths, StandardOpenOption}
import java.security.MessageDigest

/** Where replayed batches land (reference emits PutRecords to Kinesis —
  * an AWS dependency this environment doesn't ship). The trait is the
  * seam: a KinesisSink would wrap PutRecords with per-sub-record error
  * codes; tests use [[DirectoryReplaySink]].
  *
  * Implementations are constructed per partition via
  * [[ReplaySinkFactory]] (must be Serializable — it travels to tasks).
  */
trait ReplaySink extends AutoCloseable {
  /** Emit one batch; return the number of records that FAILED (0 = all
    * accepted), driving the caller's partial-failure retry
    * (reference: KinesisPlayer.java:120-155).
    */
  def putBatch(payloads: Array[Array[Byte]]): Int
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
  override def putBatch(payloads: Array[Array[Byte]]): Int = {
    val id = java.util.UUID.randomUUID().toString
    val out = Paths.get(dir, s"batch-$id-$n")
    n += 1
    val bytes = payloads.map(p => p :+ '\n'.toByte).flatten
    Files.write(out, bytes.toArray[Byte], StandardOpenOption.CREATE)
    0
  }
}

final case class DirectoryReplaySinkFactory(dir: String) extends ReplaySinkFactory {
  override def open(): ReplaySink = {
    Files.createDirectories(Paths.get(dir))
    new DirectoryReplaySink(dir)
  }
}
