package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets.UTF_8
import java.util

import scala.collection.mutable.ArrayBuffer

import graft.vcr.Tape
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** The tape as a first-class Spark DataSource V2: `spark.read
  * .format("tape").load("{root}/{stream}")`.
  *
  * Schema: `payload BINARY, dt STRING, src STRING, seq_first BIGINT,
  * seq_last BIGINT` — the file-name sequence range (reference:
  * InjectableS3Emitter.java:38-44) surfaces as metadata columns, which
  * the plain text reader cannot give you.
  *
  * Scale behaviors baked into the scan:
  * - `dt` filters push down into directory pruning at planning time —
  *   a day-range replay never lists, let alone reads, other days
  *   (reference behavior: KinesisPlayer.java:221-246).
  * - Files bin-pack into input partitions of ~`TapeScan.TargetSplit`
  *   bytes, so a tape of millions of small flush files doesn't become
  *   millions of tasks, and one task never reads one huge day alone
  *   unless it is genuinely one file.
  */
class TapeDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "tape"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    if (options.getBoolean("ingest", false)) TapeWrite.IngestSchema
    else TapeTable.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new TapeTable(properties.get("path"),
      "true".equalsIgnoreCase(properties.getOrDefault("ingest", "false")))

  override def supportsExternalMetadata(): Boolean = false
}

object TapeTable {
  val Schema: StructType = StructType(Seq(
    StructField(Tape.PayloadCol, BinaryType, nullable = false),
    StructField(Tape.DtCol, StringType, nullable = false),
    StructField("src", StringType, nullable = false),
    StructField("seq_first", LongType, nullable = true),
    StructField("seq_last", LongType, nullable = true)))
}

/** Read face by default; with `ingest=true` the table exposes the
  * append-only write face instead (schema data/seq/ts — see TapeWrite).
  */
class TapeTable(path: String, ingest: Boolean = false)
  extends Table with SupportsRead with SupportsWrite {
  require(path != null, "tape source requires a path")
  override def name(): String = s"tape($path)"
  override def schema(): StructType =
    if (ingest) TapeWrite.IngestSchema else TapeTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    if (ingest) util.EnumSet.of(TableCapability.BATCH_WRITE)
    else util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    require(!ingest, "an ingest=true tape table is write-only")
    new TapeScanBuilder(path, options.getInt("maxFilesPerTrigger", 0),
      options.getLong("maxBytesPerTrigger", 0L))
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(ingest, "reads use the default table; pass ingest=true to write")
    new TapeWriteBuilder(path, info)
  }
}

class TapeScanBuilder(path: String, maxFilesPerTrigger: Int = 0,
                      maxBytesPerTrigger: Long = 0L)
  extends ScanBuilder
  with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var dtFilters: Array[Filter] = Array.empty
  private var required: StructType = TapeTable.Schema

  /** dt-only comparisons are fully applied by directory pruning; all
    * other filters stay post-scan.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (dt, rest) = filters.partition(TapeScan.isPrunableDtFilter)
    dtFilters = dt
    rest
  }
  override def pushedFilters(): Array[Filter] = dtFilters

  override def pruneColumns(requiredSchema: StructType): Unit = {
    required = requiredSchema
  }

  override def build(): Scan = {
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    new TapeScan(path, dtFilters, required,
      new SerializableConfiguration(conf), maxFilesPerTrigger,
      maxBytesPerTrigger)
  }
}

object TapeScan {
  /** target bytes per input partition when bin-packing tape files */
  val TargetSplit: Long = 128L * 1024 * 1024

  def isPrunableDtFilter(f: Filter): Boolean = f match {
    case EqualTo(a, _: String) => a == Tape.DtCol
    case GreaterThan(a, _: String) => a == Tape.DtCol
    case GreaterThanOrEqual(a, _: String) => a == Tape.DtCol
    case LessThan(a, _: String) => a == Tape.DtCol
    case LessThanOrEqual(a, _: String) => a == Tape.DtCol
    case In(a, vs) => a == Tape.DtCol && vs.forall(_.isInstanceOf[String])
    case _ => false
  }

  /** ISO dates compare lexicographically, so string compares suffice. */
  def dtMatches(dt: String, f: Filter): Boolean = f match {
    case EqualTo(_, v: String) => dt == v
    case GreaterThan(_, v: String) => dt > v
    case GreaterThanOrEqual(_, v: String) => dt >= v
    case LessThan(_, v: String) => dt < v
    case LessThanOrEqual(_, v: String) => dt <= v
    case In(_, vs) => vs.exists(_ == dt)
    case _ => true
  }
}

final case class TapeFileSlice(file: String, dt: String, size: Long,
                               seqFirst: Long, seqLast: Long)

final case class TapeInputPartition(files: Array[TapeFileSlice])
  extends InputPartition

class TapeScan(path: String, dtFilters: Array[Filter], required: StructType,
               conf: SerializableConfiguration,
               maxFilesPerTrigger: Int = 0,
               maxBytesPerTrigger: Long = 0L) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
  : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new TapeMicroBatchStream(path, dtFilters, required, conf,
      maxFilesPerTrigger, maxBytesPerTrigger)
  override def description(): String =
    s"TapeScan path=$path prunedBy=[${dtFilters.mkString(", ")}]"

  private val SeqRangeRe = "(\\d+)-(\\d+)(?:\\.txt)?".r

  /** Driver-side planning: list ONLY day directories matching the
    * pushed dt predicates, then bin-pack files into ~TargetSplit
    * partitions (largest-first first-fit).
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val root = new Path(path)
    val fs = FileSystem.get(root.toUri, conf.value)
    if (!fs.exists(root)) return Array.empty
    val slices = ArrayBuffer[TapeFileSlice]()
    for (dtDir <- fs.listStatus(root) if dtDir.isDirectory) {
      val name = dtDir.getPath.getName
      if (name.startsWith(s"${Tape.DtCol}=")) {
        val dt = name.stripPrefix(s"${Tape.DtCol}=")
        if (dtFilters.forall(TapeScan.dtMatches(dt, _))) {
          for (f <- fs.listStatus(dtDir.getPath)
               if f.isFile && !f.getPath.getName.startsWith("_")
                 && !f.getPath.getName.startsWith(".")) {
            val (sf, sl) = f.getPath.getName match {
              case SeqRangeRe(a, b) => (a.toLong, b.toLong)
              case _ => (-1L, -1L)
            }
            slices += TapeFileSlice(f.getPath.toString, dt, f.getLen, sf, sl)
          }
        }
      }
    }
    // largest-first first-fit bin-packing to ~TargetSplit bytes
    val bins = ArrayBuffer[(ArrayBuffer[TapeFileSlice], Long)]()
    for (s <- slices.sortBy(-_.size)) {
      bins.find(_._2 + s.size <= TapeScan.TargetSplit) match {
        case Some(bin) =>
          bin._1 += s
          val i = bins.indexOf(bin)
          bins(i) = (bin._1, bin._2 + s.size)
        case None => bins += ((ArrayBuffer(s), s.size))
      }
    }
    bins.map(b => TapeInputPartition(b._1.toArray): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TapeReaderFactory(required, conf)
}

class TapeReaderFactory(required: StructType, conf: SerializableConfiguration)
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val files = partition.asInstanceOf[TapeInputPartition].files
    new PartitionReader[InternalRow] {
      private val fieldIdx = required.fieldNames
      private var fileIdx = -1
      private var reader: BufferedReader = _
      private var current: TapeFileSlice = _
      private var line: String = _

      private def nextFile(): Boolean = {
        if (reader != null) { reader.close(); reader = null }
        fileIdx += 1
        if (fileIdx >= files.length) return false
        current = files(fileIdx)
        val p = new Path(current.file)
        val fs = FileSystem.get(p.toUri, conf.value)
        reader = new BufferedReader(new InputStreamReader(fs.open(p), UTF_8))
        true
      }

      override def next(): Boolean = {
        while (true) {
          if (reader == null && !nextFile()) return false
          line = reader.readLine()
          if (line == null) {
            if (!nextFile()) return false
          } else if (line.nonEmpty) { // reference skips empty lines
            return true
          }
        }
        false
      }

      override def get(): InternalRow = {
        val values = fieldIdx.map {
          case Tape.PayloadCol => java.util.Base64.getDecoder.decode(line)
          case Tape.DtCol => UTF8String.fromString(current.dt)
          case "src" => UTF8String.fromString(current.file)
          case "seq_first" =>
            if (current.seqFirst >= 0) java.lang.Long.valueOf(current.seqFirst)
            else null
          case "seq_last" =>
            if (current.seqLast >= 0) java.lang.Long.valueOf(current.seqLast)
            else null
        }
        new GenericInternalRow(values.asInstanceOf[Array[Any]])
      }

      override def close(): Unit = if (reader != null) reader.close()
    }
  }
}
