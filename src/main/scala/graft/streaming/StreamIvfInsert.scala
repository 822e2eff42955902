package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** R30: streaming IVF index maintenance — S32's `ivfInsert` run
  * continuously: new vectors arrive as a stream and every micro-batch
  * appends its assignment-routed rows to the deployed artifact's
  * postings partitions. This is the write-side complement of R19
  * (which streams QUERIES against a static index): together they are
  * the standing topology of a production vector store — one stream
  * grows the index, one serves from it.
  *
  * Topology: the k-row codebook collects ONCE at start-up (part of the
  * offline build, the `queryAssigner` discipline); each trigger's work
  * is one narrow literal-argmax projection plus one partitioned parquet
  * write — no join, no shuffle wider than the batch, no rewrite of any
  * existing row. The artifact is the state and it lives OUTSIDE the
  * stream (the R18 CAS rule), so per-trigger cost is O(batch) and the
  * index a concurrent reader sees only ever GROWS: a vector is
  * queryable from the trigger after its arrival, and S31 tombstones
  * compose unchanged (deletes mask, inserts append, compaction
  * reconciles — the LSM triangle).
  *
  * Exactly-once under replay, including a crash MID-commit: each
  * trigger stages its routed rows beside the artifact, then moves the
  * staged files into the live postings partitions under names OWNED by
  * the batch id (`b{batchId}-{i}.parquet`), then writes a per-batch
  * commit marker. Sources replay a failed trigger with the same batch
  * id and the same data, and assignment under a fixed codebook is
  * deterministic — so redelivery touches the same cluster set, removes
  * any `b{batchId}-*` leftovers a crashed attempt left behind, and
  * re-moves fresh copies: the postings converge on exactly one copy of
  * the batch no matter where the previous attempt died. A committed
  * batch id is a pure no-op. (Transient: recovery of a half-moved
  * batch briefly retracts rows a reader may have seen early; they
  * return within the same replay. An append-only reader never sees
  * duplicates.) Compaction prunes markers older than any reachable
  * replay (`SimQueries.pruneInsertMarkers`).
  */
object StreamIvfInsert {

  /** Insert one batch id-sealed via [[StagedCommit]]: no-op if this
    * batchId already committed; otherwise stage → claim-owned move →
    * marker. Factored out so the spec can drive a replay (and a
    * mid-commit crash) directly.
    *
    * @param moveLimit test hook: stop after moving this many staged
    *                  files (simulates a crash mid-move); < 0 = all.
    */
  private[streaming] def insertBatch(s: SparkSession, artifact: String,
      assign: DataFrame => DataFrame, b: DataFrame, batchId: Long,
      moveLimit: Int = -1): Unit = {
    StagedCommit.commit(s, artifact, batchId, moveLimit) { staging =>
      assign(b
        .withColumn("vn",
          graft.functions.VectorFunctions.normalize(col("v")))
        .select(col("vec_id"), col("vn")))
        .write.mode("overwrite").partitionBy("cluster")
        .parquet(s"$staging/postings")
    }
    s.catalog.refreshByPath(s"$artifact/postings")
  }

  /** Start appending `vecs` (a streaming frame of (vec_id BIGINT,
    * v ARRAY&lt;DOUBLE&gt;)) into the IVF artifact at `artifact`.
    * Normalization happens here so the wire format matches R19's query
    * stream — raw vectors in, the artifact's (vec_id, vn, cluster)
    * layout out.
    */
  def start(s: SparkSession, artifact: String, vecs: DataFrame,
            checkpoint: String): StreamingQuery = {
    val assign = graft.sim.SimQueries.ivfAssigner(s, artifact)
    vecs.writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         batchId: Long) =>
          insertBatch(s, artifact, assign, b.toDF(), batchId)
      }.start()
  }
}
