package graft.sim

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S41: RETRAIN as an operation — the action the S33 drift monitor
  * recommends, executed without serving downtime. S33 closes with a
  * flag ("the refit strictly improves"); this closes the LOOP: build
  * the refit index beside the live one and swap a pointer, so the
  * monitor's promised gain is REALIZED, atomically, while queries
  * keep serving.
  *
  * Layout (the versioned-artifact shape — E31's discipline raised one
  * level, because a retrain must swap centroids AND postings
  * TOGETHER; two per-table manifest swaps would leave a window where
  * a reader mixes the new codebook with the old inverted file):
  *
  *   artifact/_current            ← text pointer: "gen-N" (atomic
  *                                  tmp→rename swap, max-version NOT
  *                                  needed — the pointer IS the truth)
  *   artifact/gen-N/centroids     ← one ivfIndexWrite-layout index
  *   artifact/gen-N/postings        per generation
  *
  * A serve resolves `_current` ONCE and answers entirely from that
  * generation — old or new, never a mix, by construction. A retrain
  * killed anywhere before the pointer swap leaves the live generation
  * untouched (the half-built directory is an orphan the retry
  * overwrites). Generations older than the previous one are deleted
  * at the NEXT retrain (the E31 generation grace: an in-flight reader
  * of the just-replaced generation must finish within one retrain
  * cycle).
  *
  * The refit is EXACTLY the step the monitor priced: assign the
  * current corpus under the deployed codebook, one Lloyd step
  * (`KMeans.meanByKey`), re-assign. The spec pins the contract that
  * makes the monitor actionable: the retrained deployment's measured
  * objective equals the monitor's `obj_retrained_micro` integer —
  * the promise and the delivery are the same number.
  */
object IvfReindex {

  private def currentPath(artifact: String) = new Path(s"$artifact/_current")

  def currentGen(fs: FileSystem, artifact: String): Option[String] = {
    val p = currentPath(artifact)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
      finally in.close()
    }
  }

  // private[sim]: IvfPqReindex (the compressed family's generation
  // refresh) swaps the same pointer with the same crash semantics
  private[sim] def swapPointer(fs: FileSystem, artifact: String,
                               gen: String): Unit = {
    val tmp = new Path(s"$artifact/.tmp-current")
    val out = fs.create(tmp, true)
    try out.write(gen.getBytes("UTF-8")) finally out.close()
    val dest = currentPath(artifact)
    // POSIX rename overwrites atomically; HDFS needs delete-first,
    // and the worst crash there leaves NO pointer — callers treat a
    // missing pointer as "artifact offline", never as a mixed view
    if (fs.exists(dest) && !fs.rename(tmp, dest)) {
      fs.delete(dest, false)
      if (!fs.rename(tmp, dest))
        throw new java.io.IOException(s"pointer swap failed: $dest")
    } else if (!fs.exists(dest) && !fs.rename(tmp, dest))
      throw new java.io.IOException(s"pointer swap failed: $dest")
  }

  /** Initial deployment: build generation 0 from `train` (an explicit
    * (vec_id, v, vn, label) frame — the S32 scenario deploys on a
    * corpus subset) and point `_current` at it.
    */
  def deployOn(train: DataFrame, artifact: String): Unit = {
    val s = train.sparkSession
    val fs = graft.streaming.SnapshotManifest.fsOf(s, artifact)
    SimQueries.ivfIndexWriteOn(train, s"$artifact/gen-0")
    swapPointer(fs, artifact, "gen-0")
  }

  /** The live generation's root — what every serve and the monitor
    * read. Resolved ONCE per operation; the whole answer comes from
    * this directory (old or new, never a mix).
    */
  def liveRoot(s: SparkSession, artifact: String): String = {
    val fs = graft.streaming.SnapshotManifest.fsOf(s, artifact)
    val gen = currentGen(fs, artifact).getOrElse(
      throw new IllegalStateException(
        s"$artifact has no _current pointer — not a versioned " +
          "IVF deployment (deployOn writes it)"))
    s"$artifact/$gen"
  }

  /** Retrain against the CURRENT corpus: one Lloyd refit from the
    * deployed codebook (exactly the step S33 priced), new generation
    * built beside the live one, atomic pointer swap, generations
    * beyond the previous retired (grace). Returns the new generation
    * name.
    *
    * @param onPoint test hook fired at "built" (new generation on
    *                disk, pointer NOT yet swapped) and "swapped".
    */
  def retrain(s: SparkSession, artifact: String, corpus: DataFrame,
              onPoint: String => Unit = _ => ()): String = {
    val fs = graft.streaming.SnapshotManifest.fsOf(s, artifact)
    graft.streaming.SnapshotManifest.withMaintenanceLock(fs, artifact) {
      val gen = currentGen(fs, artifact).getOrElse(
        throw new IllegalStateException(s"$artifact: no _current"))
      val n = gen.stripPrefix("gen-").toLong
      val next = s"gen-${n + 1}"
      val cb0 = s.read.parquet(s"$artifact/$gen/centroids")
      // the monitor's refit, verbatim: assign under deployed, one
      // Lloyd step
      val a1 = KMeans.assign(corpus.select(col("vec_id"), col("v")), cb0)
      val cb1 = KMeans.meanByKey(a1.select(col("cluster"), col("v")),
        "cluster")
      val nextDir = s"$artifact/$next"
      if (fs.exists(new Path(nextDir))) fs.delete(new Path(nextDir), true)
      cb1.write.mode("overwrite").parquet(s"$nextDir/centroids")
      val cents = KMeans.collectCodebook(cb1)
      val best = array_max(array(cents.map { case (c, cv) =>
        struct(
          round(graft.functions.VectorFunctions.dot(col("vn"),
            typedLit(graft.functions.VectorFunctions.normalizeSeq(cv))),
            6).as("ccos"),
          lit(-c).as("neg_cluster"))
      }: _*))
      corpus.select(col("vec_id"), col("vn"),
          (best.getField("neg_cluster") * lit(-1L)).as("cluster"))
        .write.mode("overwrite").partitionBy("cluster")
        .parquet(s"$nextDir/postings")
      graft.streaming.SnapshotManifest.track(s, nextDir, "postings")
      onPoint("built")
      swapPointer(fs, artifact, next)
      onPoint("swapped")
      // generation grace: keep the PREVIOUS generation for in-flight
      // readers; everything older retires now
      fs.listStatus(new Path(artifact)).toSeq.foreach { st =>
        val nm = st.getPath.getName
        if (st.isDirectory && nm.startsWith("gen-") &&
          nm.stripPrefix("gen-").toLongOption.exists(_ < n))
          fs.delete(st.getPath, true)
      }
      next
    }
  }

  /** Serve the standard query set from the LIVE generation — resolves
    * the pointer once, then the S27 artifact serve verbatim.
    */
  def serve(s: SparkSession, dir: String, artifact: String): DataFrame =
    SimQueries.ivfServeArtifact(s, dir, liveRoot(s, artifact))
}
