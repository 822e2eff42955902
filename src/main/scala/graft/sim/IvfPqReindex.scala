package graft.sim

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S46: generation REFRESH for the deployed COMPRESSED index — the
  * S41 versioned-deployment discipline applied to S43/S45: a stale
  * compressed deployment is replaced by building the refreshed index
  * BESIDE the live one and swapping the same atomic `_current`
  * pointer ([[IvfReindex.swapPointer]] — identical crash semantics:
  * a serve resolves the pointer once and answers entirely from that
  * generation, old or new, never a mix).
  *
  * Honest naming: the flat family RETRAINS (one Lloyd refit from the
  * deployed codebook — exactly what the S33 monitor priced); the
  * compressed family's codebooks are label-seeded means, which do
  * not refit from the deployed state — so this verb is a REFRESH:
  * rebuild both codebook families and the code table under the
  * CURRENT corpus, behind the pointer. The operational contract is
  * the same: no serving downtime, crash-before-swap leaves the live
  * generation untouched and the retry completes, generations beyond
  * the previous retire at the next refresh (grace), the whole pass
  * under the root `_maintenance` lock (mutually exclusive with every
  * AnnCli maintenance verb, which root-locks on versioned
  * deployments).
  *
  * The corpus frame must carry `label` (the codebook seed) beside
  * (vec_id, v, vn) — a [[CorpusReader]] that cannot supply labels is
  * refused loudly rather than silently mis-seeding.
  */
object IvfPqReindex {

  /** Initial deployment: build generation 0 from `train` and point
    * `_current` at it.
    *
    * @param trainer the PQ-book trainer for generation 0 — `label`
    *                (seed means, the S43 default) or `lloyd` (the
    *                S52 alternation). Stamped in the generation's
    *                `_books` marker so every later refresh rebuilds
    *                with the SAME trainer.
    */
  def deployOn(train: DataFrame, artifact: String,
               trainer: String = "label"): Unit = {
    val s = train.sparkSession
    val fs = graft.streaming.SnapshotManifest.fsOf(s, artifact)
    buildWith(trainer, train, s"$artifact/gen-0")
    IvfReindex.swapPointer(fs, artifact, "gen-0")
  }

  private def buildWith(trainer: String, corpus: DataFrame,
                        outDir: String): Unit = trainer match {
    case "label" => SimQueries.ivfPqIndexWriteOn(corpus, outDir)
    case "lloyd" => SimQueries.ivfPqLloydIndexWriteOn(corpus, outDir)
    case other => throw new IllegalArgumentException(
      s"unknown PQ-book trainer '$other' (label | lloyd)")
  }

  /** Rebuild under the CURRENT corpus into the next generation, swap
    * the pointer, retire generations beyond the previous (grace).
    * Returns the new generation name.
    *
    * @param onPoint test hook fired at "built" (new generation on
    *                disk, pointer NOT yet swapped) and "swapped".
    */
  def refresh(s: SparkSession, artifact: String, corpus: DataFrame,
              onPoint: String => Unit = _ => ()): String = {
    require(corpus.columns.contains("label"),
      "compressed refresh seeds its codebooks from `label` — the " +
        "corpus frame (CorpusReader) must supply it")
    val fs = graft.streaming.SnapshotManifest.fsOf(s, artifact)
    graft.streaming.SnapshotManifest.withMaintenanceLock(fs, artifact) {
      val gen = IvfReindex.currentGen(fs, artifact).getOrElse(
        throw new IllegalStateException(s"$artifact: no _current"))
      // the rebuild below ships RAW-encoded books/codes; refreshing a
      // residual (S45) generation would silently SWAP the deployment's
      // encoding behind the pointer — refuse by name instead (the
      // `_encoding` marker, round 13)
      val enc = SimQueries.encodingOf(fs, s"$artifact/$gen")
      if (enc != "raw")
        throw new IllegalArgumentException(
          s"$artifact live generation $gen is '$enc'-encoded: refresh " +
            "rebuilds the RAW (S43) encoding and would silently swap " +
            "the deployment's encoding — rebuild residual artifacts " +
            "with ivfPqResIndexWrite behind your own pointer swap")
      // TRAINER-FAITHFUL rebuild (S52, round 14): the live
      // generation's `_books` marker names the trainer that built
      // its codebooks; rebuilding a Lloyd generation with the seed
      // arithmetic would silently DOWNGRADE the books behind the
      // pointer — the exact wrong-delivery the S49 monitor's
      // trainer-faithful pricing promises against
      val trainer = SimQueries.booksOf(fs, s"$artifact/$gen")
      val n = gen.stripPrefix("gen-").toLong
      val next = s"gen-${n + 1}"
      val nextDir = s"$artifact/$next"
      if (fs.exists(new Path(nextDir))) fs.delete(new Path(nextDir), true)
      buildWith(trainer, corpus, nextDir)
      onPoint("built")
      IvfReindex.swapPointer(fs, artifact, next)
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

  /** Serve the standard query set from the LIVE generation. */
  def serve(s: SparkSession, dir: String, artifact: String): DataFrame =
    SimQueries.ivfPqServeArtifact(s, dir,
      IvfReindex.liveRoot(s, artifact))
}
