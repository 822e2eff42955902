package graft.vcr

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The recorder's tape sink (reference: KinesisRecorder.java +
  * InjectableS3Emitter.java).
  *
  * The reference buffers records per KCL worker and flushes each buffer
  * to one S3 object named `{stream}/{yyyy-MM-dd}/{firstSeq}-{lastSeq}`.
  * Spark-first equivalent: one output file per (task, day) —
  * `repartitionByRange(dt, seq)` gives each task a seq-contiguous slice
  * (the moral equivalent of a per-shard buffer), the text sink writes
  * one Base64 line per record under `dt=…/` Hive partitions, and a
  * metadata-only rename pass applies the `{firstSeq}-{lastSeq}` names
  * from a per-(day, task) manifest.
  *
  * Scale note (100 TB): the data path is a single shuffle + scan; the
  * manifest is one tiny aggregate (≤ #files rows) on the same persisted
  * partitioning, and renames are O(#files) namenode/S3 metadata calls on
  * the driver. A production refinement is a custom FileCommitProtocol
  * that names files from task-local min/max seq during the commit
  * itself, folding the manifest+rename into the write.
  */
object TapeWriter {

  private val PartFileRe = "part-(\\d+)-.*".r

  /** Write a record frame (`data BINARY, seq BIGINT, ts TIMESTAMP`) as a
    * tape under `root/stream/`. Returns the number of files written.
    *
    * @param numFiles target parallelism (≅ number of flushed buffers);
    *                 pick so each file ≈ the reference's 100 MiB buffer.
    */
  def write(records: DataFrame, root: String, stream: String,
            numFiles: Int = 0,
            mode: SaveMode = SaveMode.Overwrite): Int = {
    val spark = records.sparkSession
    val n = if (numFiles > 0) numFiles else spark.sparkContext.defaultParallelism
    val lines = Tape.toLines(records)
      .repartitionByRange(n, col(Tape.DtCol), col(Tape.SeqCol))
      .sortWithinPartitions(col(Tape.DtCol), col(Tape.SeqCol))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // (day, task) -> seq range; ≤ one row per output file.
      val manifest = lines
        .withColumn("pid", spark_partition_id())
        .groupBy(col(Tape.DtCol), col("pid"))
        .agg(min(Tape.SeqCol).as("first"), max(Tape.SeqCol).as("last"))
        .collect()
        .map(r => (r.getString(0), r.getInt(1)) ->
          (r.getLong(2), r.getLong(3))).toMap

      val dir = s"$root/$stream"
      lines.select(col(Tape.LineCol).as("value"), col(Tape.DtCol))
        .write.mode(mode).partitionBy(Tape.DtCol).text(dir)

      renameToSeqRanges(lines.sparkSession, dir, manifest)
    } finally lines.unpersist()
  }

  /** Apply `{firstSeq}-{lastSeq}` names to the task-numbered part files
    * (reference: InjectableS3Emitter.java:38-44).
    */
  private def renameToSeqRanges(spark: org.apache.spark.sql.SparkSession,
                                dir: String,
                                manifest: Map[(String, Int), (Long, Long)]): Int = {
    val fs = FileSystem.get(new Path(dir).toUri,
      spark.sparkContext.hadoopConfiguration)
    var renamed = 0
    val dtDirs = fs.globStatus(new Path(dir, s"${Tape.DtCol}=*"))
    for (dtDir <- dtDirs; f <- fs.listStatus(dtDir.getPath)
         if f.isFile && f.getPath.getName.startsWith("part-")) {
      val dt = dtDir.getPath.getName.stripPrefix(s"${Tape.DtCol}=")
      f.getPath.getName match {
        case PartFileRe(pidStr) =>
          manifest.get((dt, pidStr.toInt)).foreach { case (first, last) =>
            fs.rename(f.getPath, new Path(dtDir.getPath, s"$first-$last.txt"))
            renamed += 1
          }
        case _ => ()
      }
    }
    renamed
  }
}
