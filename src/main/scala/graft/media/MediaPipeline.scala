package graft.media

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY §2.6): media travels as an opaque
  * `binary` column plus typed metadata; decode/feature-extraction runs
  * batched per partition so codec state is reused and rows never visit
  * the driver.
  *
  * The container ships no image/audio codecs, so [[StubCodec]] is a
  * clearly-marked deterministic fake — the Spark-side plumbing (schema,
  * partition-preserving batch shape, typed Dataset boundary) is the
  * real, tested part. Swap `StubCodec.decode` for a JNI/javacv call and
  * nothing else changes.
  */
object MediaPipeline {

  /** A media row: payload + metadata the catalog would carry. */
  final case class MediaRecord(media_id: Long, blob: Array[Byte],
                               mime: String)

  /** Extracted features (fake values, real shape). */
  final case class MediaFeatures(media_id: Long, mime: String,
                                 byte_len: Int, width: Int, height: Int,
                                 dominant: Int, frames: Int)

  /** The stub decoder: deterministic functions of the bytes only. A
    * real implementation decodes headers/frames here; `???`-equivalent
    * marker: STUB — do not ship.
    */
  object StubCodec {
    def decode(r: MediaRecord): MediaFeatures = {
      val len = r.blob.length
      val h = java.util.Arrays.hashCode(r.blob)
      MediaFeatures(
        media_id = r.media_id,
        mime = r.mime,
        byte_len = len,
        width = 16 + math.floorMod(h, 1280),
        height = 16 + math.floorMod(h / 1280, 720),
        dominant = if (len == 0) 0 else java.lang.Byte.toUnsignedInt(
          r.blob(math.floorMod(h, len))),
        frames = 1 + len % 4)
    }
  }

  /** Decode a media frame batch-wise. One codec "context" per
    * partition (the `it.map` closure position is where a real codec
    * would be opened once and reused), output stays distributed.
    */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real codecs: open context here, close via CompletionIterator
      it.map(StubCodec.decode)
    }
  }

  /** documents.text re-cast as a media table: the bytes are real, the
    * mime is derived — a stand-in for an image/audio blob column.
    */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    graft.Tables.documents(s, dir).select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("blob"),
      concat(lit("image/"), element_at(
        array(lit("jpeg"), lit("png"), lit("webp")),
        (col("doc_id") % 3 + 1).cast("int"))).as("mime"))
      .as[MediaRecord]
  }

  /** M2 as a gate entry (rows-only: the mapPartitions boundary is not
    * SQL-expressible, the specs pin its values).
    */
  def mediaDecode(s: SparkSession, dir: String): DataFrame = {
    decodeFeatures(mediaTable(s, dir)).toDF().orderBy(col("media_id"))
  }
}
