package graft.vcr

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** V13: tape zone-map manifest — the seek index that makes the tape
  * addressable by SEQUENCE without touching payload bytes.
  *
  * The reference player can only narrow a replay by day folder and
  * object mtime (KinesisPlayer.java:199-246); any finer seek reads and
  * decodes everything. But a tape file's NAME already declares its
  * exact seq range (`{firstSeq}-{lastSeq}`, S3RecorderPipeline.java:
  * 45-58) — the manifest materializes those declarations, plus
  * per-file line counts and byte sizes, as one small parquet under
  * `_manifest/`. That is the Iceberg-manifest shape for this layout:
  * at 100 TB the tape is millions of objects, and re-LISTING them per
  * query (what the reference's driver loop and the estimator's
  * metadata pass both do) costs minutes of object-store round trips —
  * while the manifest is a few MB of parquet that one filter prunes.
  *
  * `readSeqRange` is the payoff: a seq-window replay reads ONLY the
  * files whose declared range overlaps the request (file-grain zone
  * map pruning; day-grain pruning falls out of the same filter via
  * dt). Semantics are zone-map semantics: whole overlapping files are
  * returned, finer selection belongs to the caller's residual filter
  * — same contract as the dt= partition pruning one level up.
  *
  * The build is one distributed pass over line METADATA (counts and
  * lengths — `line_bytes` prices the decoded-payload estimate the
  * V8 estimator models); no payload ever reaches the driver, and the
  * seek collect moves only matched file paths (~100 bytes each), the
  * same scale class as the planner's own file index.
  */
object TapeManifest {

  val ManifestDir = "_manifest"

  private val nameRe = "^(\\d+)-(\\d+)(?:\\.txt)?$"

  /** Per-file zone maps, computed distributed: `(dt, file, first_seq,
    * last_seq, n_lines, line_bytes)`. Files whose names violate the
    * `{first}-{last}` contract are EXCLUDED here — fsck (V12) owns
    * reporting them; an index must not address what it cannot bound.
    */
  def build(spark: SparkSession, root: String, stream: String): DataFrame = {
    val dir = s"$root/$stream"
    spark.read.option("basePath", dir).text(dir)
      .select(col("value"),
        regexp_extract(input_file_name(), "([^/]+)$", 1).as("file"),
        col(Tape.DtCol).cast("string").as(Tape.DtCol))
      .groupBy(col(Tape.DtCol), col("file"))
      .agg(count(lit(1)).as("n_lines"),
        // content bytes incl. the '\n' the text sink appends per line
        sum(length(col("value")) + lit(1L)).as("line_bytes"))
      .withColumn("first_seq",
        regexp_extract(col("file"), nameRe, 1))
      .withColumn("last_seq",
        regexp_extract(col("file"), nameRe, 2))
      .filter(col("first_seq") =!= "" &&
        col("first_seq").cast("long") <= col("last_seq").cast("long"))
      .select(col(Tape.DtCol), col("file"),
        col("first_seq").cast("long").as("first_seq"),
        col("last_seq").cast("long").as("last_seq"),
        col("n_lines"), col("line_bytes"))
  }

  /** Build and persist the manifest parquet beside the day partitions
    * (`{root}/{stream}/_manifest`; the leading underscore keeps text
    * scans of the tape from reading it — Spark's own convention for
    * metadata side-files).
    */
  def write(spark: SparkSession, root: String, stream: String): Unit =
    build(spark, root, stream).coalesce(1).write.mode("overwrite")
      .parquet(s"$root/$stream/$ManifestDir")

  def load(spark: SparkSession, root: String, stream: String): DataFrame =
    spark.read.parquet(s"$root/$stream/$ManifestDir")

  final case class RefreshResult(added: Long, removed: Long, kept: Long)

  /** V14: INCREMENTAL manifest maintenance — the ops loop that keeps
    * V13's index honest as the recorder appends and retention expires.
    * Tape files are immutable once written (the recorder never
    * rewrites a sealed object), so the manifest diff is exact: one
    * METADATA listing of the day dirs, stats built by READING ONLY
    * the files the manifest hasn't seen (at a steady-state archive
    * that's the last trigger's output, not the tape), rows for
    * vanished files (retention/compaction) dropped. A full rebuild
    * re-reads the archive; at 100 TB that difference is the whole
    * point of having an index.
    */
  def refresh(spark: SparkSession, root: String,
              stream: String): RefreshResult = {
    val dir = s"$root/$stream"
    val listed = listTapeFiles(spark, dir) // (dt, file) pairs on disk
    val existing =
      try load(spark, root, stream).collect().toSeq
      catch { case _: Throwable => Seq.empty[org.apache.spark.sql.Row] }
    val existingKeys = existing.map(r => (r.getString(0), r.getString(1)))
      .toSet
    val kept = existing.filter(r =>
      listed.contains((r.getString(0), r.getString(1))))
    val newFiles = listed.filterNot(existingKeys)
    val added: Seq[org.apache.spark.sql.Row] =
      if (newFiles.isEmpty) Seq.empty
      else {
        val paths = newFiles.toSeq.map { case (dt, f) =>
          s"$dir/${Tape.DtCol}=$dt/$f" }
        spark.read.option("basePath", dir).text(paths: _*)
          .select(col("value"),
            regexp_extract(input_file_name(), "([^/]+)$", 1).as("file"),
            col(Tape.DtCol).cast("string").as(Tape.DtCol))
          .groupBy(col(Tape.DtCol), col("file"))
          .agg(count(lit(1)).as("n_lines"),
            sum(length(col("value")) + lit(1L)).as("line_bytes"))
          .withColumn("first_seq", regexp_extract(col("file"), nameRe, 1))
          .withColumn("last_seq", regexp_extract(col("file"), nameRe, 2))
          .filter(col("first_seq") =!= "" &&
            col("first_seq").cast("long") <= col("last_seq").cast("long"))
          .select(col(Tape.DtCol), col("file"),
            col("first_seq").cast("long").as("first_seq"),
            col("last_seq").cast("long").as("last_seq"),
            col("n_lines"), col("line_bytes"))
          .collect().toSeq
      }
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField(Tape.DtCol, StringType), StructField("file", StringType),
      StructField("first_seq", LongType), StructField("last_seq", LongType),
      StructField("n_lines", LongType), StructField("line_bytes", LongType)))
    spark.createDataFrame((kept ++ added).asJava, schema)
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/$ManifestDir")
    RefreshResult(added.length.toLong,
      (existing.length - kept.length).toLong, kept.length.toLong)
  }

  /** (dt, file) pairs on disk — one FS metadata pass, no content. */
  private def listTapeFiles(spark: SparkSession,
                            dir: String): Set[(String, String)] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Set.empty
    fs.listStatus(root).toSeq
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(s"${Tape.DtCol}="))
      .flatMap { day =>
        val dt = day.getPath.getName.stripPrefix(s"${Tape.DtCol}=")
        fs.listStatus(day.getPath).toSeq
          .filter(st => st.isFile && !st.getPath.getName.startsWith(".") &&
            !st.getPath.getName.startsWith("_"))
          .map(st => (dt, st.getPath.getName))
      }.toSet
  }

  /** Manifest entries whose declared seq range overlaps `[from, to]`. */
  def overlapping(manifest: DataFrame, from: Long, to: Long): DataFrame =
    manifest.filter(col("first_seq") <= to && col("last_seq") >= from)

  /** Zone-map-pruned seq-range read: decode ONLY the files whose
    * declared range overlaps `[from, to]`. Returns the TapePlayer.read
    * shape (`line, dt, src, payload`) so every downstream (batcher,
    * replay sink, estimator) composes unchanged. A missing manifest is
    * an error by design — building it implicitly would silently pay
    * the full-listing cost the index exists to avoid.
    */
  def readSeqRange(spark: SparkSession, root: String, stream: String,
                   from: Long, to: Long): DataFrame = {
    val dir = s"$root/$stream"
    val entries = overlapping(load(spark, root, stream), from, to)
      .select(col(Tape.DtCol), col("file")).collect()
    val files = entries.map(r =>
      s"$dir/${Tape.DtCol}=${r.getString(0)}/${r.getString(1)}").toSeq
    if (files.isEmpty)
      return spark.range(0).select(
        lit("").as(Tape.LineCol), lit("").as(Tape.DtCol),
        lit("").as("src"), lit(Array.empty[Byte]).as(Tape.PayloadCol))
    spark.read.option("basePath", dir).text(files: _*)
      .filter(length(col("value")) > 0)
      .select(
        col("value").as(Tape.LineCol),
        col(Tape.DtCol).cast("string").as(Tape.DtCol),
        input_file_name().as("src"),
        Tape.decodeLine(col("value")).as(Tape.PayloadCol))
  }
}
