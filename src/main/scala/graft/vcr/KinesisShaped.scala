package graft.vcr

import java.security.MessageDigest

import scala.collection.mutable

/** A Kinesis-shaped connector seam, without the AWS SDK (zero-egress
  * environment). The types mirror the public PutRecords / DescribeStream
  * contracts the reference drives (KinesisPlayer.java:90-155 —
  * per-sub-record failure codes, ≤500 records / ≤1 MB batches,
  * open-shard counting), so a production build swaps [[FakeKinesis]]
  * for a thin SDK adapter and nothing above the seam changes.
  */
final case class PutRecordsEntry(partitionKey: String, data: Array[Byte])

/** One result per request entry, positionally aligned — exactly how
  * PutRecords reports partial failure (errorCode non-empty = retry me).
  */
final case class PutRecordsResultEntry(sequenceNumber: Option[String],
                                       shardId: Option[String],
                                       errorCode: Option[String],
                                       errorMessage: Option[String])

final case class PutRecordsResponse(entries: IndexedSeq[PutRecordsResultEntry]) {
  def failedRecordCount: Int = entries.count(_.errorCode.isDefined)
  def failedIndices: Array[Int] =
    entries.zipWithIndex.collect { case (e, i) if e.errorCode.isDefined => i }
      .toArray
}

/** One record off the stream — what GetRecords returns per entry
  * (sequence number, partition key, payload, approximate arrival).
  */
final case class ConsumedRecord(sequenceNumber: String, partitionKey: String,
                                data: Array[Byte],
                                approximateArrivalMillis: Long)

final case class GetRecordsResponse(records: IndexedSeq[ConsumedRecord],
                                    nextShardIterator: Option[String],
                                    millisBehindLatest: Long)

object ShardIteratorType {
  val TrimHorizon = "TRIM_HORIZON"
  val Latest = "LATEST"
  val AtSequenceNumber = "AT_SEQUENCE_NUMBER"
  val AfterSequenceNumber = "AFTER_SEQUENCE_NUMBER"
}

/** One shard's lineage entry, as ListShards reports it: a shard born
  * from a split carries its parent's id; a merge child carries both
  * parents (ParentShardId + AdjacentParentShardId in the public API).
  * Consumers use the lineage for the KCL's ordering rule: drain a
  * parent to SHARD_END before starting its children.
  */
final case class ShardInfo(shardId: String, open: Boolean,
                           parentIds: Seq[String])

/** A service-shaped retryable error (the consume-side analog of the
  * positional error codes PutRecords reports).
  */
final class KinesisServiceException(val errorCode: String)
  extends RuntimeException(errorCode)

object KinesisServiceException {
  val Throttled = "ProvisionedThroughputExceededException"
  def isThrottle(t: Throwable): Boolean = t match {
    case k: KinesisServiceException => k.errorCode == Throttled
    case _ => false
  }
}

/** The endpoint seam: what the reference needs from Kinesis — the
  * PRODUCE faces its player drives (PutRecords/DescribeStream,
  * KinesisPlayer.java:90-155) and the CONSUME faces its KCL recorder
  * sits on (shard discovery + GetShardIterator/GetRecords, the calls
  * under KinesisConnectorExecutorBase in KinesisRecorder.java:23-47).
  */
trait KinesisEndpoint {
  /** Open shards only — closed (split/merged-away) shards have an
    * ending sequence number and don't serve writes
    * (reference: KinesisPlayer.java:77-83).
    */
  def describeStreamOpenShards(stream: String): Int

  /** PutRecords: atomic request validation (≤500 entries, ≤1 MiB per
    * record, ≤5 MiB per request — the public API limits), per-entry
    * success/failure in the response.
    */
  def putRecords(stream: String, entries: IndexedSeq[PutRecordsEntry]): PutRecordsResponse

  /** Open shard ids, in id order — what the KCL seeds its lease table
    * from before assigning one consumer per shard.
    */
  def listOpenShardIds(stream: String): IndexedSeq[String]

  /** ALL shards — open and closed — with their parent lineage, in id
    * order: the ListShards face. Resharding-aware consumers re-list per
    * poll so mid-run splits/merges are discovered without a restart.
    */
  def listShards(stream: String): IndexedSeq[ShardInfo]

  /** An opaque position token for a shard: TRIM_HORIZON (oldest),
    * LATEST, or AT/AFTER a sequence number — the public
    * GetShardIterator contract.
    */
  def getShardIterator(stream: String, shardId: String, iteratorType: String,
                       startingSequenceNumber: Option[String] = None): String

  /** Positional (non-destructive) read of up to `limit` records from an
    * iterator; the returned `nextShardIterator` continues the scan and
    * is None only when a CLOSED shard is fully drained. May throw
    * [[KinesisServiceException]] (throttling) — consumers retry with
    * backoff, exactly like the produce side.
    */
  def getRecords(shardIterator: String, limit: Int): GetRecordsResponse
}

object KinesisLimits {
  val MaxEntriesPerRequest = 500
  val MaxBytesPerRecord: Int = 1 << 20 // 1 MiB, data + partition key
  val MaxBytesPerRequest: Int = 5 << 20
}

/** In-memory Kinesis stand-in. Faithful where the reference depends on
  * behavior: MD5(partition key) hash-range shard routing, per-shard
  * monotonic sequence numbers, positional per-entry error codes, whole-
  * request ValidationException on limit breaches, open-vs-closed shard
  * accounting. Thread-safe — replay tasks put concurrently.
  *
  * `failureHook(entry, attempt)` injects per-entry error codes (e.g.
  * ProvisionedThroughputExceededException) by attempt number, letting
  * specs script the partial-failure episodes the reference's retry loop
  * must survive; attempt counts are also how specs prove accepted
  * records are never re-sent.
  */
final class FakeKinesis extends KinesisEndpoint {

  final case class StoredRecord(sequenceNumber: String, partitionKey: String,
                                data: Array[Byte],
                                arrivalMillis: Long = 0L)
  final class Shard(val shardId: String, var open: Boolean,
                    val parents: Seq[String] = Nil) {
    val records = mutable.ArrayBuffer.empty[StoredRecord]
  }
  private final class Stream(val shards: mutable.ArrayBuffer[Shard]) {
    def shard(id: String): Shard = shards.find(_.shardId == id).getOrElse(
      throw new NoSuchElementException(s"ResourceNotFound: shard $id"))
    def nextShardId(): String = f"shardId-${shards.size}%012d"
  }

  private val streams = mutable.Map.empty[String, Stream]
  private val seqCounter = new java.util.concurrent.atomic.AtomicLong(0L)
  private val attempts = mutable.Map.empty[String, Int]
  private val readAttempts = mutable.Map.empty[String, Int]
  @volatile private var failureHook
  : (PutRecordsEntry, Int) => Option[String] = (_, _) => None
  @volatile private var readFailureHook
  : (String, Int) => Option[String] = (_, _) => None
  /** Arrival clock, fixable by specs for deterministic `dt` partitions. */
  @volatile var clock: () => Long = () => System.currentTimeMillis()

  def createStream(name: String, openShards: Int, closedShards: Int = 0)
  : this.type = synchronized {
    val shards = (0 until openShards).map(i => new Shard(f"shardId-$i%012d", true)) ++
      (0 until closedShards).map(i =>
        new Shard(f"shardId-${openShards + i}%012d", false))
    streams(name) = new Stream(mutable.ArrayBuffer.from(shards))
    this
  }

  /** SplitShard: the parent closes (stops serving writes, keeps its
    * records for readers to drain to SHARD_END) and two children open,
    * each carrying the parent's id in its lineage — the service's
    * scale-up reshard. Returns the child ids.
    */
  def splitShard(stream: String, shardId: String): (String, String) =
    synchronized {
      val st = streams.getOrElse(stream,
        throw new NoSuchElementException(s"ResourceNotFound: stream $stream"))
      val parent = st.shard(shardId)
      require(parent.open, s"ValidationException: shard $shardId is closed")
      parent.open = false
      val c1 = new Shard(st.nextShardId(), true, Seq(shardId))
      st.shards += c1
      val c2 = new Shard(st.nextShardId(), true, Seq(shardId))
      st.shards += c2
      (c1.shardId, c2.shardId)
    }

  /** MergeShards: both parents close and one child opens carrying both
    * ids in its lineage (ParentShardId + AdjacentParentShardId) — the
    * scale-down reshard. Returns the child id.
    */
  def mergeShards(stream: String, shardA: String, shardB: String): String =
    synchronized {
      val st = streams.getOrElse(stream,
        throw new NoSuchElementException(s"ResourceNotFound: stream $stream"))
      val (a, b) = (st.shard(shardA), st.shard(shardB))
      require(a.open && b.open,
        s"ValidationException: merge parents must be open")
      a.open = false
      b.open = false
      val c = new Shard(st.nextShardId(), true, Seq(shardA, shardB))
      st.shards += c
      c.shardId
    }

  def setFailureHook(h: (PutRecordsEntry, Int) => Option[String]): Unit =
    failureHook = h

  /** Inject consume-side error codes by (shardId, attempt#) — how specs
    * script the read-throttling episodes the recorder's retry loop must
    * survive.
    */
  def setReadFailureHook(h: (String, Int) => Option[String]): Unit =
    readFailureHook = h

  override def describeStreamOpenShards(stream: String): Int = synchronized {
    streams.getOrElse(stream,
      throw new NoSuchElementException(s"ResourceNotFound: stream $stream"))
      .shards.count(_.open)
  }

  /** MD5 hash-range routing over the OPEN shards, like the service:
    * the 128-bit key hash is mapped to evenly-split shard ranges.
    */
  private def route(shards: collection.IndexedSeq[Shard], key: String): Shard = {
    val open = shards.filter(_.open)
    val h = BigInt(1, MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")))
    open(((h * open.size) >> 128).toInt)
  }

  override def putRecords(stream: String,
                          entries: IndexedSeq[PutRecordsEntry]): PutRecordsResponse = synchronized {
    val st = streams.getOrElse(stream,
      throw new NoSuchElementException(s"ResourceNotFound: stream $stream"))
    require(entries.nonEmpty && entries.size <= KinesisLimits.MaxEntriesPerRequest,
      s"ValidationException: 1..${KinesisLimits.MaxEntriesPerRequest} records per request")
    require(entries.forall(e =>
      e.data.length + e.partitionKey.length <= KinesisLimits.MaxBytesPerRecord),
      s"ValidationException: record exceeds ${KinesisLimits.MaxBytesPerRecord} bytes")
    require(entries.iterator.map(e =>
      e.data.length.toLong + e.partitionKey.length).sum <= KinesisLimits.MaxBytesPerRequest,
      s"ValidationException: request exceeds ${KinesisLimits.MaxBytesPerRequest} bytes")
    PutRecordsResponse(entries.map { e =>
      val n = attempts.updateWith(s"$stream$Sep${e.partitionKey}")(
        c => Some(c.getOrElse(0) + 1)).get
      failureHook(e, n) match {
        case Some(code) =>
          PutRecordsResultEntry(None, None, Some(code), Some(s"injected: $code"))
        case None =>
          val shard = route(st.shards, e.partitionKey)
          val seq = f"${seqCounter.incrementAndGet()}%021d"
          shard.records += StoredRecord(seq, e.partitionKey, e.data, clock())
          PutRecordsResultEntry(Some(seq), Some(shard.shardId), None, None)
      }
    })
  }

  override def listOpenShardIds(stream: String): IndexedSeq[String] =
    synchronized {
      streams.getOrElse(stream,
        throw new NoSuchElementException(s"ResourceNotFound: stream $stream"))
        .shards.filter(_.open).map(_.shardId).toIndexedSeq
    }

  override def listShards(stream: String): IndexedSeq[ShardInfo] =
    synchronized {
      streams.getOrElse(stream,
        throw new NoSuchElementException(s"ResourceNotFound: stream $stream"))
        .shards.map(s => ShardInfo(s.shardId, s.open, s.parents))
        .toIndexedSeq
    }

  /** Iterator token = stream / shard / position index, opaque to
    * callers (the service's tokens are likewise position-encoding
    * blobs). Positions index the shard's arrival-ordered record list.
    */
  private val Sep = '\u0001'
  private def iteratorAt(stream: String, shardId: String, idx: Int): String =
    s"$stream$Sep$shardId$Sep$idx"

  override def getShardIterator(stream: String, shardId: String,
                                iteratorType: String,
                                startingSequenceNumber: Option[String] = None)
  : String = synchronized {
    val st = streams.getOrElse(stream,
      throw new NoSuchElementException(s"ResourceNotFound: stream $stream"))
    val shard = st.shards.find(_.shardId == shardId).getOrElse(
      throw new NoSuchElementException(s"ResourceNotFound: shard $shardId"))
    def seqIdx: Int = {
      val want = startingSequenceNumber.getOrElse(
        throw new IllegalArgumentException(
          "ValidationException: sequence number required"))
      val i = shard.records.indexWhere(_.sequenceNumber == want)
      require(i >= 0, s"ValidationException: unknown sequence number $want")
      i
    }
    val idx = iteratorType match {
      case ShardIteratorType.TrimHorizon => 0
      case ShardIteratorType.Latest => shard.records.size
      case ShardIteratorType.AtSequenceNumber => seqIdx
      case ShardIteratorType.AfterSequenceNumber => seqIdx + 1
      case t => throw new IllegalArgumentException(
        s"ValidationException: iterator type $t")
    }
    iteratorAt(stream, shardId, idx)
  }

  override def getRecords(shardIterator: String, limit: Int)
  : GetRecordsResponse = synchronized {
    val Array(stream, shardId, idxStr) = shardIterator.split(Sep)
    val idx = idxStr.toInt
    val shard = streams.getOrElse(stream,
      throw new NoSuchElementException(s"ResourceNotFound: stream $stream"))
      .shards.find(_.shardId == shardId).getOrElse(
        throw new NoSuchElementException(s"ResourceNotFound: shard $shardId"))
    val n = readAttempts.updateWith(s"$stream$Sep$shardId")(
      c => Some(c.getOrElse(0) + 1)).get
    readFailureHook(shardId, n).foreach(code =>
      throw new KinesisServiceException(code))
    val taken = shard.records.slice(idx, idx + math.max(limit, 1))
      .map(r => ConsumedRecord(r.sequenceNumber, r.partitionKey, r.data,
        r.arrivalMillis))
      .toIndexedSeq
    val nextIdx = idx + taken.size
    val next = if (!shard.open && nextIdx >= shard.records.size) None
    else Some(iteratorAt(stream, shardId, nextIdx))
    val behind = taken.lastOption
      .map(r => math.max(0L, clock() - r.approximateArrivalMillis))
      .getOrElse(0L)
    GetRecordsResponse(taken, next, behind)
  }

  /** Assertion faces for specs. */
  def shardsOf(stream: String): IndexedSeq[Shard] = synchronized {
    streams(stream).shards.toIndexedSeq
  }
  /** GetRecords attempts for one shard of one stream — like the
    * put-side counter, keyed per (stream, shard) so identically-named
    * shards on different streams don't conflate.
    */
  def readAttemptCount(stream: String, shardId: String): Int = synchronized {
    readAttempts.getOrElse(s"$stream$Sep$shardId", 0)
  }
  def allRecords(stream: String): IndexedSeq[StoredRecord] = synchronized {
    streams(stream).shards.flatMap(_.records).toIndexedSeq
  }
  /** Put attempts for a key on one stream — counters are per
    * (stream, key), so identical keys on different streams don't
    * conflate.
    */
  def attemptCount(stream: String, partitionKey: String): Int = synchronized {
    attempts.getOrElse(s"$stream$Sep$partitionKey", 0)
  }
}

/** JVM-wide registry so serialized task-side factories can reach the
  * shared in-memory endpoint in local mode (a real deployment would
  * construct an SDK-backed endpoint here instead).
  */
object FakeKinesisRegistry {
  private val endpoints = new java.util.concurrent.ConcurrentHashMap[String, FakeKinesis]()
  def create(name: String): FakeKinesis = {
    val e = new FakeKinesis
    endpoints.put(name, e)
    e
  }
  def get(name: String): Option[FakeKinesis] = Option(endpoints.get(name))
  def remove(name: String): Unit = endpoints.remove(name)
}

/** ReplaySink speaking the PutRecords contract: one call per batch,
  * failed sub-record INDICES back to the caller so only those retry
  * (reference: KinesisPlayer.java:131-144).
  */
final class KinesisReplaySink(endpoint: KinesisEndpoint, stream: String)
  extends ReplaySink {
  override def putBatch(records: Array[ReplayRecord]): Array[Int] =
    endpoint.putRecords(stream,
      records.toIndexedSeq.map(r => PutRecordsEntry(r.key, r.payload)))
      .failedIndices
}

final case class KinesisReplaySinkFactory(endpointName: String, stream: String)
  extends ReplaySinkFactory {
  override def open(): ReplaySink = {
    val endpoint = FakeKinesisRegistry.get(endpointName).getOrElse(
      throw new IllegalStateException(s"no endpoint '$endpointName' registered"))
    new KinesisReplaySink(endpoint, stream)
  }
}
