package graft.sources

import java.util

import scala.collection.mutable

import graft.vcr.{KinesisEndpoint, KinesisServiceException, FakeKinesisRegistry, Retry, ShardIteratorType}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The CONSUME side of the Kinesis seam as a Structured Streaming
  * source: `spark.readStream.format("kinesis-shaped")` — the Spark
  * re-expression of the reference's KCL recorder
  * (KinesisRecorder.java:23-47): shard discovery seeds the consumer
  * set (one input partition per shard = one KCL record processor per
  * shard), streaming offsets are per-shard last-consumed sequence
  * numbers (the checkpoint replaces the KCL's DynamoDB lease table),
  * and reads ride GetShardIterator/GetRecords with
  * backoff-on-throttle, like the produce side's retry loop.
  *
  * Offsets: `{"shardId-…":"<seq>"}` — "" = nothing consumed yet
  * (TRIM_HORIZON). Within a shard, sequence numbers are monotonic, so
  * a (fromSeq, untilSeq] bound is an exact, replayable record range:
  * restarts re-read precisely the committed batch.
  *
  * Scale: the per-trigger record cap (`maxRecordsPerTrigger`, per
  * shard) is the admission-control analog of the reference's
  * size/time buffer (VcrConfiguration buffer knobs) — each micro-batch
  * is one bounded buffer per shard, flushed to the tape by the
  * recorder sink. Parallelism = shard count, the same ceiling the
  * service itself imposes on consumers.
  *
  * Endpoint resolution goes through [[graft.vcr.FakeKinesisRegistry]]
  * — in-JVM for local mode; a production build would construct an
  * SDK-backed [[KinesisEndpoint]] at the same seam.
  */
class KinesisShapedSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "kinesis-shaped"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KinesisShapedTable.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // properties carry the caller's ORIGINAL key casing
    // (asCaseSensitiveMap) — a bare lowercase get() would silently
    // miss "maxBytesPerTrigger" and drop the admission limit
    val opts = new CaseInsensitiveStringMap(properties)
    new KinesisShapedTable(
      opts.get("endpoint"),
      opts.get("stream"),
      opts.getInt("maxrecordspertrigger", 0),
      opts.getLong("maxbytespertrigger", 0L))
  }

  override def supportsExternalMetadata(): Boolean = false
}

object KinesisShapedTable {
  /** The tape's logical record schema (SURVEY §3): payload bytes, the
    * service sequence number, the approximate-arrival timestamp (drives
    * the `dt` partition), and the producer's partition key.
    */
  val Schema: StructType = StructType(Seq(
    StructField("data", BinaryType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("partition_key", StringType, nullable = false)))
}

class KinesisShapedTable(endpointName: String, stream: String,
                         maxRecordsPerTrigger: Int,
                         maxBytesPerTrigger: Long = 0L)
  extends Table with SupportsRead {
  require(endpointName != null, "kinesis-shaped requires option 'endpoint'")
  require(stream != null, "kinesis-shaped requires option 'stream'")

  override def name(): String = s"kinesis-shaped($endpointName/$stream)"
  override def schema(): StructType = KinesisShapedTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = KinesisShapedTable.Schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new KinesisShapedMicroBatchStream(endpointName, stream,
          maxRecordsPerTrigger, maxBytesPerTrigger)
      override def description(): String =
        s"KinesisShapedScan endpoint=$endpointName stream=$stream"
    }
}

/** Per-shard position map as a streaming offset. */
private[sources] case class ShardPositionsOffset(positions: Map[String, String])
  extends Offset {
  override def json(): String =
    positions.toSeq.sortBy(_._1)
      .map { case (s, q) => s""""$s":"$q"""" }
      .mkString("{", ",", "}")
}

private[sources] object ShardPositionsOffset {
  private val Entry = "\"([^\"]*)\"\\s*:\\s*\"([^\"]*)\"".r
  def fromJson(json: String): ShardPositionsOffset =
    ShardPositionsOffset(
      Entry.findAllMatchIn(json).map(m => m.group(1) -> m.group(2)).toMap)
}

class KinesisShapedMicroBatchStream(endpointName: String, stream: String,
                                    maxRecordsPerTrigger: Int,
                                    maxBytesPerTrigger: Long = 0L)
  extends MicroBatchStream with SupportsAdmissionControl {

  private def endpoint: KinesisEndpoint =
    FakeKinesisRegistry.get(endpointName).getOrElse(
      throw new IllegalStateException(s"no endpoint '$endpointName' registered"))

  override def getDefaultReadLimit: ReadLimit =
    if (maxRecordsPerTrigger > 0) ReadLimit.maxRows(maxRecordsPerTrigger)
    else ReadLimit.allAvailable()

  /** Shard discovery at stream start (the KCL's ListShards seed): seed
    * every shard with NO live parent — including closed shards that
    * still hold undrained records. Children of a listed parent wait
    * until that parent drains to SHARD_END (the KCL's parent-before-
    * child rule behind KinesisRecorder.java:23-47); [[latestOffset]]
    * re-lists per trigger, so mid-run resharding needs no restart.
    */
  override def initialOffset(): Offset = {
    val infos = endpoint.listShards(stream)
    val ids = infos.map(_.shardId).toSet
    ShardPositionsOffset(
      infos.filter(_.parentIds.forall(p => !ids.contains(p)))
        .map(_.shardId -> "").toMap)
  }

  override def deserializeOffset(json: String): Offset =
    ShardPositionsOffset.fromJson(json)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  /** Advance each shard's position by polling GetRecords from its last
    * committed sequence number — a positional (non-destructive) read,
    * so the executor-side re-read of the same range is exact. The
    * per-shard record cap implements ReadMaxRows admission; the
    * per-shard BYTE cap (`maxBytesPerTrigger`) is the reference's
    * buffer-size flush knob (VCR_BUFFER_SIZE_BYTES,
    * VcrConfiguration.java:13-16): each micro-batch admits records
    * until the buffer would overflow — always ≥1 for progress — so one
    * trigger ≅ one flushed recorder buffer per shard.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val cap = limit match {
      case m: ReadMaxRows => m.maxRows().toInt
      case _ => Int.MaxValue
    }
    val byteCap = if (maxBytesPerTrigger > 0) maxBytesPerTrigger
      else Long.MaxValue
    val ep = endpoint
    val positions = start.asInstanceOf[ShardPositionsOffset].positions
    val advanced = scala.collection.mutable.Map.empty[String, String]
    positions.foreach { case (shardId, last) =>
      if (last == KinesisShards.ShardEnd) advanced(shardId) = last
      else {
        var it: Option[String] = Some(KinesisShards.iteratorAfter(
          ep, stream, shardId, last))
        var newest = last
        var remaining = cap
        var bytesUsed = 0L
        var admitted = 0
        // drained = the service returned a null continuation with every
        // record admitted: a CLOSED shard read to its end (open shards
        // always return an iterator). The KCL's SHARD_END condition.
        var drained = false
        while (it.isDefined && remaining > 0 && bytesUsed < byteCap) {
          val resp = KinesisShards.getRecordsWithRetry(ep, it.get,
            math.min(remaining, KinesisShards.MaxPerCall))
          if (resp.records.isEmpty) {
            drained = resp.nextShardIterator.isEmpty
            it = None
          } else {
            var i = 0
            var full = false
            while (i < resp.records.size && remaining > 0 && !full) {
              val r = resp.records(i)
              // service throughput accounting charges payload + partition
              // key (FakeKinesis's own PutRecords validation does too), so
              // the admission budget must count both or a trigger admits
              // slightly more than the modeled 1 MB/s/shard buffer
              val rBytes = r.data.length.toLong + r.partitionKey.length
              if (admitted == 0 || bytesUsed + rBytes <= byteCap) {
                newest = r.sequenceNumber
                bytesUsed += rBytes
                admitted += 1
                remaining -= 1
                i += 1
              } else full = true
            }
            if (full) it = None
            else {
              it = resp.nextShardIterator
              if (i == resp.records.size && it.isEmpty) drained = true
            }
          }
        }
        advanced(shardId) = if (drained) KinesisShards.ShardEnd else newest
      }
    }
    // mid-run resharding (the KCL's live split/merge handling): re-list
    // shards each trigger; a shard not yet tracked enters the offset
    // map at TRIM_HORIZON ("") only once EVERY listed parent has
    // drained to SHARD_END — parent before child, so per-key order
    // across the reshard boundary is preserved. Its records are read
    // starting with the NEXT trigger (this one's batch is already
    // bounded).
    val infos = ep.listShards(stream)
    val ids = infos.map(_.shardId).toSet
    infos.foreach { info =>
      if (!advanced.contains(info.shardId)) {
        val parentsDone = info.parentIds.forall(p =>
          advanced.get(p).contains(KinesisShards.ShardEnd) ||
            !ids.contains(p))
        if (parentsDone) advanced(info.shardId) = ""
      }
    }
    ShardPositionsOffset(advanced.toMap)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[ShardPositionsOffset].positions
    val to = end.asInstanceOf[ShardPositionsOffset].positions
    to.toSeq.sortBy(_._1).collect {
      case (shardId, untilSeq) if untilSeq != from.getOrElse(shardId, "") =>
        KinesisShardInputPartition(endpointName, stream, shardId,
          from.getOrElse(shardId, ""), untilSeq): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KinesisShardReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class KinesisShardInputPartition(endpointName: String,
                                            stream: String, shardId: String,
                                            fromSeq: String, untilSeq: String)
  extends InputPartition

private[sources] object KinesisShards {
  val MaxPerCall = 10000 // the service's GetRecords Limit ceiling
  val RetryTimeoutMillis = 30000L

  /** Offset-map sentinel: the shard is closed and fully consumed (the
    * KCL's SHARD_END). A shard at this position is never polled again,
    * and its children may start. Distinguishable from any real
    * sequence number (those are decimal digits).
    */
  val ShardEnd = "SHARD_END"

  /** Sequence numbers are decimal STRINGS of arbitrary width (the real
    * service emits ~56-digit values) — order them numerically, never
    * lexicographically ("100" < "99" as strings would truncate a
    * committed batch mid-range).
    */
  def seqLeq(a: String, b: String): Boolean = BigInt(a) <= BigInt(b)

  /** The tape's `seq` column is BIGINT; service sequence numbers can
    * exceed it. Fail loudly rather than overflow — an SDK-backed
    * adapter at this seam remaps service sequence numbers to compact
    * per-shard longs before they reach the tape.
    */
  def seqAsLong(seq: String): Long = {
    val b = BigInt(seq)
    require(b.isValidLong, s"sequence number $seq exceeds the tape's " +
      "BIGINT seq column; the endpoint adapter must remap service " +
      "sequence numbers to compact per-shard longs")
    b.toLong
  }

  def iteratorAfter(ep: KinesisEndpoint, stream: String, shardId: String,
                    last: String): String =
    if (last.isEmpty)
      ep.getShardIterator(stream, shardId, ShardIteratorType.TrimHorizon)
    else
      ep.getShardIterator(stream, shardId,
        ShardIteratorType.AfterSequenceNumber, Some(last))

  /** GetRecords with the reference's backoff-on-throttle loop
    * (ExponentialBackoffRunner.java) — a still-throttled read at the
    * deadline fails the caller, never silently drops.
    */
  def getRecordsWithRetry(ep: KinesisEndpoint, iterator: String, limit: Int)
  : graft.vcr.GetRecordsResponse =
    Retry.withBackoff(
      () => ep.getRecords(iterator, limit),
      retryOn = KinesisServiceException.isThrottle,
      timeoutMillis = RetryTimeoutMillis)
      .getOrElse(throw new KinesisServiceException(
        KinesisServiceException.Throttled))
}

class KinesisShardReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[KinesisShardInputPartition]
    new PartitionReader[InternalRow] {
      private val ep = FakeKinesisRegistry.get(p.endpointName).getOrElse(
        throw new IllegalStateException(
          s"no endpoint '${p.endpointName}' registered"))
      private var it: Option[String] =
        Some(KinesisShards.iteratorAfter(ep, p.stream, p.shardId, p.fromSeq))
      private val buf = mutable.Queue.empty[graft.vcr.ConsumedRecord]
      private var done = false
      private var current: graft.vcr.ConsumedRecord = _

      override def next(): Boolean = {
        while (buf.isEmpty && !done && it.isDefined) {
          val resp = KinesisShards.getRecordsWithRetry(ep, it.get,
            KinesisShards.MaxPerCall)
          // the batch's bound: records past untilSeq belong to later
          // micro-batches (sequence numbers are monotonic per shard;
          // compared numerically — see KinesisShards.seqLeq). A
          // SHARD_END bound means "to the end of the closed shard":
          // the drain is finite, the null continuation terminates it.
          val inRange =
            if (p.untilSeq == KinesisShards.ShardEnd) resp.records
            else resp.records.takeWhile(r =>
              KinesisShards.seqLeq(r.sequenceNumber, p.untilSeq))
          buf ++= inRange
          done = inRange.size < resp.records.size || resp.records.isEmpty
          it = resp.nextShardIterator
        }
        if (buf.isEmpty) false
        else { current = buf.dequeue(); true }
      }

      override def get(): InternalRow =
        new GenericInternalRow(Array[Any](
          current.data,
          java.lang.Long.valueOf(KinesisShards.seqAsLong(
            current.sequenceNumber)),
          java.lang.Long.valueOf(current.approximateArrivalMillis * 1000L),
          UTF8String.fromString(current.partitionKey)))

      override def close(): Unit = ()
    }
  }
}
