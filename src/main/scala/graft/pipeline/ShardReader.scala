package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** P39: the loader READ path — the consumer half of the
  * tape → curate → pack → shard → TRAIN handoff whose write side
  * P32/P35 (packed blocks), P33 (epoch order), P36 (shard manifests)
  * and P37 (the block artifact) pin hash-by-hash. A data-parallel
  * training rank calls `readShard(artifact, epoch, rank)` and gets
  * its epoch shard — the P33 order restricted to its round-robin
  * positions — with the whole contract VERIFIED before a row is
  * yielded:
  *
  *  1. the rank's expected (position, block_id) list is re-derived
  *     from the STATELESS P33/P36 math (md5 epoch:block rank, two-
  *     phase bucketed; worker = (position-1) mod W) over the
  *     artifact's own block-id column — no stored permutation to
  *     trust, nothing to go stale;
  *  2. every block's token ids are re-hashed and checked against the
  *     artifact's stored per-block `token_md5` (and its recounted
  *     length against `n_tokens`): the finest-grain check, run FIRST
  *     so a refusal names how many blocks are corrupt; also the guard
  *     for a corrupted stored-digest column itself;
  *  3. BOTH P36 Merkle digests are recomputed over exactly what will
  *     be read — with [[PipelineQueries.shardManifestOn]], the
  *     writer's OWN arithmetic, so reader and writer can never
  *     drift — and compared to the deployed manifest row:
  *     `blocks_md5` (membership + order — a dropped, added, or
  *     re-ordered block fails here) and `tokens_md5` (the token-byte
  *     fold, computed from the RE-HASHED ids, never the stored
  *     column — so a tamper that rewrites token_ids AND the stored
  *     per-block md5 consistently at unchanged length still refuses;
  *     spec'd — the residual the first cut of this reader shipped
  *     with, closed).
  *
  * Scale shape: the derivation pass (1) touches ONLY the artifact's
  * block_id column — a column-pruned scan of corpus_tokens/PackBlock
  * rows, ~8 bytes each, nothing near the token payload. The data pass
  * reads the artifact once with the rank's block→position map joined
  * in as a BROADCAST (blocks/W entries ≈ 16 bytes each — ~10⁵-10⁶
  * entries at 100 TB-scale W and PackBlock, megabytes, comfortably
  * broadcastable): a broadcast-hash filter at the scan, zero shuffle
  * of token payload, 1/W of rows survive. The block_id
  * range-partition layout P37 writes keeps a shard's surviving rows
  * block-sorted within files; no corpus-sized collect anywhere — the
  * only driver materialization is the one-row digest comparison.
  * Union over the W ranks ≡ the epoch order bit-for-bit (spec'd);
  * ranks are pairwise disjoint by the mod-W arithmetic.
  *
  * The reference (a record/replay CLI) has no loader analog; this
  * closes the suite's own training-loop edge (VERDICT r11 item 1).
  */
object ShardReader {

  /** The gate's fixed shard coordinates (epoch 1 of PackEpochs=2,
    * rank 2 of LoaderWorkers=4 — a non-zero pair so neither axis is
    * degenerate). */
  val ShardEpoch = 1
  val ShardRank = 2

  /** The artifact's pinned layout parameters (P42, round 13 — r12
    * verdict item 3): until now `readShard` derived the expected
    * order from COMPILE-TIME constants, so a reader built with
    * different constants could never read a valid artifact from
    * another build — and refused with a digest-mismatch message
    * that reads like corruption. The deploy step now pins
    * (loader_workers, pack_epochs, pack_block, shard_chunk) in a
    * `_params` sidecar beside the manifest; the reader reads them
    * back and derives with THE ARTIFACT'S OWN parameters, so
    * cross-build reads just work — and a request the artifact
    * cannot serve (rank ≥ its loader_workers, epoch ≥ its
    * pack_epochs) refuses naming the PINNED PARAMETER, never as a
    * digest mismatch. A missing sidecar is a legacy artifact and
    * falls back to the compile-time constants (the pre-P42
    * behavior, unchanged hashes); a PRESENT-but-malformed sidecar
    * refuses loudly by key.
    */
  final case class LoaderParams(loaderWorkers: Int, packEpochs: Int,
                                packBlock: Long, shardChunk: Long)

  private[graft] def writeParams(s: SparkSession, outDir: String,
                                 p: LoaderParams): Unit = {
    val path = new org.apache.hadoop.fs.Path(s"$outDir/_params")
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try out.write(
      (s"loader_workers=${p.loaderWorkers}\n" +
        s"pack_epochs=${p.packEpochs}\n" +
        s"pack_block=${p.packBlock}\n" +
        s"shard_chunk=${p.shardChunk}\n").getBytes("UTF-8"))
    finally out.close()
  }

  private[graft] def readParams(s: SparkSession,
                                artifact: String): Option[LoaderParams] = {
    val path = new org.apache.hadoop.fs.Path(s"$artifact/_params")
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return None
    val in = fs.open(path)
    val kv =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .flatMap { l =>
          l.split("=", 2) match {
            case Array(k, v) => Some(k.trim -> v.trim)
            case _ => None
          }
        }.toMap
      finally in.close()
    // sanity is part of the promise (r13 ADVICE): a sidecar pinning
    // loader_workers=0 or a value past Int range would otherwise
    // surface as `% 0` arithmetic or an empty-manifest read — a
    // confusing downstream failure instead of the loud by-key
    // refusal the sidecar exists to give
    def num(k: String, intRange: Boolean): Long = {
      val v = kv.get(k)
        .flatMap(_.toLongOption)
        .getOrElse(throw new IllegalStateException(
          s"$artifact/_params is present but does not pin '$k' — " +
            s"refusing to guess a layout parameter (found keys: " +
            s"${kv.keys.toSeq.sorted.mkString(", ")})"))
      if (v <= 0 || (intRange && v > Int.MaxValue))
        throw new IllegalStateException(
          s"$artifact/_params pins '$k'=$v, which is not a usable " +
            s"layout parameter (must be > 0" +
            (if (intRange) s" and ≤ ${Int.MaxValue}" else "") +
            ") — refusing a layout no reader can derive")
      v
    }
    Some(LoaderParams(num("loader_workers", intRange = true).toInt,
      num("pack_epochs", intRange = true).toInt,
      num("pack_block", intRange = false),
      num("shard_chunk", intRange = false)))
  }

  /** Deploy the loader handoff: the P37 block artifact under
    * `outDir/blocks`, the P36 shard manifest under
    * `outDir/manifest`, and the pinned layout parameters under
    * `outDir/_params` (P42) — what a training job ships.
    */
  def deploy(s: SparkSession, dir: String, outDir: String,
             nFiles: Int = 4): Unit = {
    CurationWriter.writeBlocks(s, dir, s"$outDir/blocks", nFiles)
    PipelineQueries.dataShardManifest(s, dir)
      .write.mode("overwrite").parquet(s"$outDir/manifest")
    writeParams(s, outDir, LoaderParams(PipelineQueries.LoaderWorkers,
      PipelineQueries.PackEpochs, PipelineQueries.PackBlock,
      PipelineQueries.ShardChunk))
  }

  private val deployments =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** One deployment per (JVM, corpus) for the gate — the
    * `insertedArtifacts` discipline from the sim family. */
  private[graft] def deployedOf(s: SparkSession, dir: String): String =
    deployments.computeIfAbsent(dir, _ => {
      val out = java.nio.file.Files
        .createTempDirectory("graft-shard-deploy").toString
      deploy(s, dir, out)
      out
    })

  /** The rank's verified epoch shard: (position, block_id, n_tokens,
    * token_md5, token_ids), ordered by position. Throws
    * IllegalStateException when the artifact disagrees with the
    * manifest (membership/order/counts) or a block's token payload
    * disagrees with its stored digest.
    *
    * @param fromPosition mid-epoch RESUME: yield only blocks at epoch
    *                     positions strictly above this (a rank
    *                     restarting at step s skips what it already
    *                     consumed). Verification intentionally stays
    *                     over the FULL shard — a resumed rank must
    *                     refuse a corrupted artifact even when the
    *                     corruption sits in the already-consumed
    *                     prefix (the next epoch will read it), and
    *                     the digest math only matches the manifest
    *                     whole. The yield filter is position-pushed
    *                     into the (already 1/W-filtered) cached frame
    *                     — no extra scan.
    */
  def readShard(s: SparkSession, artifact: String, epoch: Int,
                rank: Int, fromPosition: Long = 0L): DataFrame = {
    // P42: derive with the ARTIFACT'S pinned parameters, not this
    // build's constants; legacy artifacts (no sidecar) keep the
    // compile-time values
    val p = readParams(s, artifact).getOrElse(
      LoaderParams(PipelineQueries.LoaderWorkers,
        PipelineQueries.PackEpochs, PipelineQueries.PackBlock,
        PipelineQueries.ShardChunk))
    val W = p.loaderWorkers
    if (epoch < 0 || epoch >= p.packEpochs)
      throw new IllegalArgumentException(
        s"epoch $epoch outside [0, ${p.packEpochs}): the artifact " +
          s"pins pack_epochs=${p.packEpochs} — a parameter mismatch, " +
          "not corruption")
    if (rank < 0 || rank >= W)
      throw new IllegalArgumentException(
        s"rank $rank outside [0, $W): the artifact pins " +
          s"loader_workers=$W — a parameter mismatch, not corruption")
    val manifest = s.read.parquet(s"$artifact/manifest")
      .filter(col("epoch") === epoch && col("worker") === rank)
      .collect()
    if (manifest.isEmpty)
      throw new IllegalStateException(
        s"$artifact/manifest has no row for epoch=$epoch worker=$rank")
    val m = manifest.head
    val (mBlocks, mTokens, mMd5) = (m.getAs[Long]("n_blocks"),
      m.getAs[Long]("n_tokens"), m.getAs[String]("blocks_md5"))
    val mTokMd5 = m.getAs[String]("tokens_md5")

    val blocks = s.read.parquet(s"$artifact/blocks")
    // (1) stateless re-derivation of the rank's expected order — the
    // block_id column only (column-pruned; the token payload is not
    // touched by this pass)
    val mine = PipelineQueries
      .epochOrderOn(blocks.select(col("block_id")), p.packEpochs)
      .filter(col("epoch") === epoch &&
        expr(s"(position - 1) % $W") === rank)
      .select(col("epoch"), col("position"), col("block_id"))
    // data pass: broadcast the rank's block→position map into the
    // scan — blocks/W entries, no shuffle of token payload
    val shard = graft.CachedFrames.persist(
      blocks.join(broadcast(mine), Seq("block_id"))
        .withColumn("n_tokens_read", size(col("token_ids")).cast("long"))
        .withColumn("token_md5_read", md5(concat_ws("-",
          expr("transform(token_ids, t -> cast(t as string))")))))
    // (3) per-block token payload vs its stored digest
    val tampered = shard
      .filter(col("token_md5_read") =!= col("token_md5") ||
        col("n_tokens_read") =!= col("n_tokens")).count()
    if (tampered > 0)
      throw new IllegalStateException(
        s"$tampered block(s) of shard (epoch=$epoch rank=$rank) fail " +
          s"their stored token_md5/n_tokens at $artifact — refusing " +
          "to yield")
    // (2) BOTH Merkle digests, recomputed with the WRITER'S fold over
    // what will actually be yielded — the token fold runs over the
    // RE-HASHED token ids (token_md5_read, never the stored column),
    // so a consistent rewrite of token_ids + stored md5 still fails
    // against the manifest's tokens_md5
    val fold = PipelineQueries.shardManifestOn(
      mine,
      shard.select(col("block_id"), col("n_tokens_read").as("n_tokens"),
        col("token_md5_read").as("token_md5")),
      p.loaderWorkers, p.shardChunk)
      .collect()
    if (fold.length != 1)
      throw new IllegalStateException(
        s"shard (epoch=$epoch rank=$rank) folded to ${fold.length} " +
          s"manifest rows at $artifact — artifact/order mismatch")
    val f = fold.head
    if (f.getAs[Long]("n_blocks") != mBlocks ||
      f.getAs[Long]("n_tokens") != mTokens ||
      f.getAs[String]("blocks_md5") != mMd5 ||
      f.getAs[String]("tokens_md5") != mTokMd5)
      throw new IllegalStateException(
        s"shard digest mismatch at $artifact (epoch=$epoch rank=$rank): " +
          s"manifest (n_blocks=$mBlocks n_tokens=$mTokens md5=$mMd5 " +
          s"tok=$mTokMd5) vs " +
          s"read (n_blocks=${f.getAs[Long]("n_blocks")} " +
          s"n_tokens=${f.getAs[Long]("n_tokens")} " +
          s"md5=${f.getAs[String]("blocks_md5")} " +
          s"tok=${f.getAs[String]("tokens_md5")}) — refusing to yield")
    shard.filter(col("position") > fromPosition)
      .select(col("position"), col("block_id"),
        col("n_tokens_read").as("n_tokens"),
        col("token_md5_read").as("token_md5"), col("token_ids"))
      .orderBy(col("position"))
  }

  /** The P39 gate: the verified shard at the fixed (epoch, rank),
    * digest columns RECOMPUTED from the token ids actually read (so
    * the oracle — pure stateless math over the corpus — pins the
    * whole write → deploy → derive → verify → read loop).
    */
  def dataReadShard(s: SparkSession, dir: String): DataFrame =
    readShard(s, deployedOf(s, dir), ShardEpoch, ShardRank)
      .select(col("position"), col("block_id"), col("n_tokens"),
        col("token_md5"))

  /** The gate's fixed resume point — roughly mid-shard at every SF
    * (epoch positions are 1..blocks, the rank holds every W-th). */
  val ResumeFrom = 970L

  /** P39b gate: the mid-epoch RESUME — the same verified shard
    * yielding only positions strictly above [[ResumeFrom]] (a rank
    * restarting at a checkpointed step). Verification still covers
    * the whole shard; the oracle is the P39 SQL with the position
    * cut applied.
    */
  def dataReadShardResume(s: SparkSession, dir: String): DataFrame =
    readShard(s, deployedOf(s, dir), ShardEpoch, ShardRank, ResumeFrom)
      .select(col("position"), col("block_id"), col("n_tokens"),
        col("token_md5"))

  lazy val dataReadShardResumeSql: String = readShardSql(
    s"AND position > $ResumeFrom")

  lazy val dataReadShardSql: String = readShardSql("")

  private def readShardSql(extraFilter: String): String = s"""
    WITH ${graft.text.TextQueries.bpeTokenFlatSql},
    g AS (
      SELECT doc_id, tok_id,
             row_number() OVER (ORDER BY doc_id, wpos, spos) - 1 AS gpos
      FROM flat),
    bs AS (
      SELECT gpos // ${PipelineQueries.PackBlock} AS block_id,
             count(*)::BIGINT AS n_tokens,
             md5(array_to_string(list(tok_id ORDER BY gpos), '-'))
               AS token_md5
      FROM g GROUP BY 1),
    ep AS (SELECT unnest(range(0, ${PipelineQueries.PackEpochs}))
             AS epoch),
    keyed AS (
      SELECT epoch, block_id, md5(epoch || ':' || block_id) AS k
      FROM bs, ep),
    ordered AS (
      SELECT epoch, block_id,
             row_number() OVER (PARTITION BY epoch ORDER BY k, block_id)
               ::BIGINT AS position
      FROM keyed)
    SELECT position, block_id, n_tokens, token_md5
    FROM ordered JOIN bs USING (block_id)
    WHERE epoch = $ShardEpoch
      AND (position - 1) % ${PipelineQueries.LoaderWorkers} = $ShardRank
      $extraFilter
    ORDER BY position"""
}
