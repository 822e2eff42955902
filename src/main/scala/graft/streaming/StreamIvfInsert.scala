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
  * append — no join, no shuffle wider than the batch, no rewrite of any
  * existing file. The artifact is the state and it lives OUTSIDE the
  * stream (the R18 CAS rule), so per-trigger cost is O(batch) and the
  * index a concurrent reader sees only ever GROWS: a vector is
  * queryable from the trigger after its arrival, and S31 tombstones
  * compose unchanged (deletes mask, inserts append, compaction
  * reconciles — the LSM triangle).
  *
  * Exactly-once under replay: a trigger that fails between the parquet
  * append and the checkpoint commit replays its batch, and a naive
  * append would duplicate those postings rows. The face seals each
  * trigger with the standard foreachBatch idempotence recipe: a
  * per-batch-id commit marker beside the artifact, written AFTER the
  * append — a replayed batch sees its marker and becomes a no-op
  * (spec'd by invoking the same batch twice). A crash between append
  * and marker still duplicates that one batch — closing that needs a
  * transactional commit protocol (the V14 manifest discipline); the
  * marker shrinks the at-risk window from "every replay" to "a crash
  * inside one two-step commit".
  */
object StreamIvfInsert {

  /** Insert one batch id-sealed: no-op if this batchId already
    * committed. Factored out so the spec can drive a replay directly.
    */
  private[streaming] def insertBatch(s: SparkSession, artifact: String,
      insert: DataFrame => Unit, b: DataFrame, batchId: Long): Unit = {
    val marker = new org.apache.hadoop.fs.Path(
      s"$artifact/_insert_commits/batch-$batchId")
    val fs = marker.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(marker)) return
    insert(b
      .withColumn("vn",
        graft.functions.VectorFunctions.normalize(col("v")))
      .select(col("vec_id"), col("vn")))
    fs.mkdirs(marker.getParent)
    fs.create(marker, true).close()
  }

  /** Start appending `vecs` (a streaming frame of (vec_id BIGINT,
    * v ARRAY&lt;DOUBLE&gt;)) into the IVF artifact at `artifact`.
    * Normalization happens here so the wire format matches R19's query
    * stream — raw vectors in, the artifact's (vec_id, vn, cluster)
    * layout out.
    */
  def start(s: SparkSession, artifact: String, vecs: DataFrame,
            checkpoint: String): StreamingQuery = {
    val insert = graft.sim.SimQueries.ivfInserter(s, artifact)
    vecs.writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         batchId: Long) =>
          insertBatch(s, artifact, insert, b.toDF(), batchId)
      }.start()
  }
}
