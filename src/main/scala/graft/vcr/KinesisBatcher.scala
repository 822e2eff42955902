package graft.vcr

import scala.collection.mutable.ArrayBuffer

/** Greedy PutRecords batch assembly: ≤ `maxCount` records and
  * ≤ `maxBytes` summed payload bytes per batch; a single record larger
  * than `maxBytes` is dropped (reference: KinesisPlayer.java:51-52,
  * OperatorBufferKinesisBatch.java:75-100).
  *
  * Divergence, documented: when a record would overflow a non-empty
  * buffer, the reference emits the buffer and LOSES the record
  * (OperatorBufferKinesisBatch.java:83-95 neither adds nor re-queues
  * it). Here the record starts the next batch — replay must be
  * loss-free; only the oversize-single-record drop is preserved.
  */
object KinesisBatcher {
  val MaxBatchCount = 500
  val MaxBatchBytes: Long = 1000000L

  final case class Batch(payloads: Array[Array[Byte]], bytes: Long) {
    def count: Int = payloads.length
  }

  /** Pure per-partition fold; Iterator→Iterator so Spark never
    * materializes more than one batch beyond the running buffer.
    */
  def assemble(records: Iterator[Array[Byte]],
               maxCount: Int = MaxBatchCount,
               maxBytes: Long = MaxBatchBytes): Iterator[Batch] =
    new Iterator[Batch] {
      private var nextBatch: Option[Batch] = None
      private var pending: Option[Array[Byte]] = None
      var dropped: Long = 0L

      private def fill(): Unit = {
        if (nextBatch.isDefined) return
        val buf = new ArrayBuffer[Array[Byte]](16)
        var bytes = 0L
        var full = false
        while (!full && (pending.isDefined || records.hasNext)) {
          val rec = pending.getOrElse(records.next())
          pending = None
          if (rec.length > maxBytes) {
            dropped += 1 // oversize single record: reference drops it too
          } else if (bytes + rec.length > maxBytes || buf.length >= maxCount) {
            pending = Some(rec)
            full = true
          } else {
            buf += rec
            bytes += rec.length
          }
        }
        if (buf.nonEmpty) nextBatch = Some(Batch(buf.toArray, bytes))
      }

      override def hasNext: Boolean = { fill(); nextBatch.isDefined }
      override def next(): Batch = {
        fill()
        val b = nextBatch.getOrElse(throw new NoSuchElementException)
        nextBatch = None
        b
      }
    }
}
