package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The exactly-once append commit shared by the streamed index
  * maintainers (R30 postings inserts, R15b graph inserts): a trigger's
  * output is STAGED beside the artifact, then moved file-by-file into
  * the live table(s) under names OWNED by the batch id
  * (`b{batchId}-…parquet`), then sealed with a per-batch commit
  * marker. Sources replay a failed trigger with the same batch id and
  * the same data, and the staged write is deterministic — so
  * redelivery visits the same destination directories, removes any
  * `b{batchId}-*` leftovers a crashed attempt left, and re-moves fresh
  * copies: the tables converge on exactly one copy of the batch no
  * matter where the previous attempt died. A committed batch id is a
  * pure no-op. Offline compaction must leave files of UNCOMMITTED
  * batch ids alone (see `SimQueries.ivfCompact`) — they are mid-commit
  * and the replay owns them.
  */
object StagedCommit {

  /** Run `stage` (which writes one or more parquet table trees under
    * the given staging root, each `table/partition dirs…/part files`),
    * then move every staged parquet file into
    * `artifact/<same relative path dir>/b{batchId}-{n}.parquet` and
    * seal the batch. No-op when the batch id is already sealed.
    *
    * @param moveLimit test hook: stop (throw) after moving this many
    *                  files — simulates a crash mid-commit; < 0 = all.
    */
  def commit(s: SparkSession, artifact: String, batchId: Long,
             moveLimit: Int = -1)(stage: String => Unit): Unit = {
    val conf = s.sparkContext.hadoopConfiguration
    val commits = new Path(s"$artifact/_insert_commits")
    val marker = new Path(commits, s"batch-$batchId")
    val fs = marker.getFileSystem(conf)
    if (fs.exists(marker) || batchId <= lowWatermark(fs, artifact)) return
    val staging = new Path(s"$artifact/_insert_staging/batch-$batchId")
    if (fs.exists(staging)) fs.delete(staging, true) // crashed leftovers
    stage(staging.toString)
    var moved = 0
    // (table, rel-under-table) of every file this commit moved in —
    // registered on listing-held tables below, BEFORE the marker
    val movedRels = scala.collection.mutable.ArrayBuffer[(String, String)]()
    // the walk is NAME-SORTED so a replay reproduces the exact
    // (staged file → b{id}-{n} destination) mapping of the crashed
    // attempt — the registered names stay truthful across replays
    def walk(src: Path, relDir: String): Unit = {
      fs.listStatus(src).sortBy(_.getPath.getName).foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory) walk(st.getPath,
          if (relDir.isEmpty) name else s"$relDir/$name")
        else if (name.endsWith(".parquet")) {
          val dest = new Path(s"$artifact/$relDir")
          fs.mkdirs(dest)
          val destName = moveInto(fs, st.getPath, dest, batchId, moved)
          val cut = relDir.indexOf('/')
          if (relDir.nonEmpty) {
            val table = if (cut < 0) relDir else relDir.take(cut)
            val rel = if (cut < 0) destName
              else s"${relDir.drop(cut + 1)}/$destName"
            movedRels += (table -> rel)
          }
          moved += 1
          if (moveLimit >= 0 && moved >= moveLimit)
            throw new java.io.IOException(
              s"simulated crash after moving $moved files (batch $batchId)")
        }
      }
    }
    // pass 1: clear this batch's leftovers from a crashed previous
    // attempt in EVERY destination dir the staged tree maps to —
    // before any move, so redelivery converges instead of accumulating
    def sweep(src: Path, relDir: String): Unit =
      fs.listStatus(src).foreach { st =>
        if (st.isDirectory) sweep(st.getPath,
          if (relDir.isEmpty) st.getPath.getName
          else s"$relDir/${st.getPath.getName}")
        else if (st.getPath.getName.endsWith(".parquet")) {
          val dest = new Path(s"$artifact/$relDir")
          if (fs.exists(dest))
            fs.listStatus(dest)
              .filter(_.getPath.getName.startsWith(s"b$batchId-"))
              .foreach(x => fs.delete(x.getPath, false))
        }
      }
    sweep(staging, "")
    walk(staging, "")
    fs.delete(staging, true)
    // register-THEN-seal on listing-held tables: a crash in between
    // leaves registered-but-unsealed names, which every resolve
    // excludes through the committed view, and the replay re-moves
    // the identical sorted names — so registration is idempotent and
    // never points at a file the replay won't recreate
    movedRels.groupBy(_._1).foreach { case (table, rels) =>
      SnapshotManifest.register(fs, artifact, table, rels.map(_._2).toSeq)
    }
    fs.mkdirs(commits)
    fs.create(marker, true).close()
  }

  private def moveInto(fs: FileSystem, src: Path, destDir: Path,
                       batchId: Long, n: Int): String = {
    val name = s"b$batchId-$n.parquet"
    val to = new Path(destDir, name)
    if (!fs.rename(src, to))
      throw new java.io.IOException(s"insert commit move failed: $src -> $to")
    name
  }

  /** The committed-batch view: the live marker set PLUS the marker-
    * prune low-watermark — every id at or below the watermark is
    * committed even though its marker has been retired. Without the
    * watermark, pruning a marker whose `b{id}-*` files still sit in
    * never-rewritten partitions would reclassify those committed files
    * as uncommitted FOREVER: every later compaction would exclude and
    * spare them, their tombstoned rows could never be physically
    * reclaimed, and their tombstones would never retire.
    */
  final case class Committed(ids: Set[Long], low: Long) {
    def contains(id: Long): Boolean = id <= low || ids.contains(id)
  }

  private def commitsDir(artifact: String): Path =
    new Path(s"$artifact/_insert_commits")

  private val watermarkRe = "^low-watermark-(\\d+)$".r

  /** Highest marker-pruned batch id (-1 when nothing was ever pruned).
    * Sound under Spark's single-outstanding-batch replay: a marker for
    * id N exists only after every id < N committed, so advancing the
    * watermark to a pruned marker's id never covers a batch that is
    * genuinely mid-commit.
    *
    * The value lives in the marker file's NAME (`low-watermark-{id}`,
    * max wins), never in its content: an in-place content overwrite
    * could crash mid-write and leave an empty file, silently resetting
    * the watermark to -1 and permanently reclassifying batches whose
    * markers were pruned in EARLIER runs as uncommitted — exactly the
    * misclassification the watermark exists to prevent. A named marker
    * either exists or it doesn't; there is no torn state.
    */
  def lowWatermark(fs: FileSystem, artifact: String): Long = {
    val dir = commitsDir(artifact)
    if (!fs.exists(dir)) return -1L
    val named = fs.listStatus(dir).toSeq
      .flatMap(_.getPath.getName match {
        case watermarkRe(id) => id.toLongOption
        case _ => None
      })
      .foldLeft(-1L)(math.max)
    math.max(named, legacyWatermark(fs, dir))
  }

  /** Pre-named-marker artifacts stored the watermark as the CONTENT of
    * a single `low-watermark` file. Without this read path an existing
    * artifact would silently reset to -1 on upgrade, reclassifying
    * batches whose markers were already pruned as uncommitted — their
    * committed `b{id}-*` files would stop resolving. Folded into the
    * max above; `advanceLowWatermark` migrates it to a named marker
    * (and retires the legacy file) on its next advance. A torn legacy
    * file (empty/garbled content) reads as -1 — no worse than the
    * pre-fix behavior, and the named markers win once written.
    */
  private def legacyWatermark(fs: FileSystem, dir: Path): Long = {
    val legacy = new Path(dir, "low-watermark")
    if (!fs.exists(legacy)) return -1L
    val in = fs.open(legacy)
    val body =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    body.toLongOption.getOrElse(-1L)
  }

  /** Advance the watermark (monotone; written BEFORE the markers it
    * covers are deleted, so a crash between the two leaves ids both
    * covered and marked — harmless). Atomic by construction: create
    * the new named marker first, then retire superseded ones — a
    * crash at any point leaves the max intact.
    */
  def advanceLowWatermark(fs: FileSystem, artifact: String,
                          id: Long): Unit = {
    if (id <= lowWatermark(fs, artifact)) return
    val dir = commitsDir(artifact)
    fs.mkdirs(dir)
    fs.create(new Path(dir, s"low-watermark-$id"), true).close()
    fs.listStatus(dir).toSeq.foreach { st =>
      st.getPath.getName match {
        case watermarkRe(old) if old.toLongOption.exists(_ < id) =>
          fs.delete(st.getPath, false)
        // migrate: the legacy content-based file is superseded by the
        // named marker just written (id > its value by the guard above)
        case "low-watermark" => fs.delete(st.getPath, false)
        case _ => ()
      }
    }
  }

  /** Batch ids sealed at this artifact (live markers only — prefer
    * `committedView`, which folds in the prune watermark).
    */
  def committedIds(fs: FileSystem, artifact: String): Set[Long] = {
    val commits = new Path(s"$artifact/_insert_commits")
    if (!fs.exists(commits)) Set.empty
    else fs.listStatus(commits).toSeq
      .flatMap(_.getPath.getName.stripPrefix("batch-").toLongOption).toSet
  }

  /** Markers + watermark: the view maintenance readers must use. */
  def committedView(fs: FileSystem, artifact: String): Committed =
    Committed(committedIds(fs, artifact), lowWatermark(fs, artifact))

  private val batchFileRe = "^b(\\d+)-.*".r

  /** True for a `b{id}-*` file whose batch is NOT sealed: it is
    * mid-commit and the replay owns it — maintenance readers
    * (compaction, the insert descent itself) must skip AND spare it.
    */
  def uncommittedFile(name: String, committed: Committed): Boolean =
    name match {
      case batchFileRe(id) => !committed.contains(id.toLong)
      case _ => false
    }

  /** The COMMITTED parquet files of `artifact/<table>` (recursive, so
    * partition layouts pass through): the consistent view a maintainer
    * reads while commits may be mid-flight.
    */
  def committedParquet(s: SparkSession, artifact: String,
                       table: String): Seq[String] = {
    val dir = new Path(s"$artifact/$table")
    val fs = dir.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return Seq.empty
    val committed = committedView(fs, artifact)
    def walk(p: Path): Seq[Path] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val nm = st.getPath.getName
        // hidden dirs (`_manifest`, staging) are metadata, not data
        if (nm.startsWith("_") || nm.startsWith(".")) Seq.empty
        else if (st.isDirectory) walk(st.getPath)
        else if (nm.endsWith(".parquet") &&
          !uncommittedFile(nm, committed))
          Seq(st.getPath)
        else Seq.empty
      }
    walk(dir).map(_.toString)
  }
}
