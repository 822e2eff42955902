package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** R15b: streamed inserts into the PERSISTED layered-graph artifact —
  * R15's insert-is-search-plus-connect (which maintains in-memory
  * DataFrame state inside one query's lifetime) re-pointed at the S36
  * parquet artifact, so the grown graph SURVIVES the stream: a restart
  * resumes from the checkpoint and the artifact, nothing rebuilds.
  * This closes the asymmetry the round-8 verdict named — the IVF
  * ladder had deploy/serve/insert/delete/compact while the graph rungs
  * rebuilt per invocation.
  *
  * Per trigger: one descent over the committed artifact (the search),
  * one bounded connect (top-M per new node + reverse edges), one
  * StagedCommit-sealed append of (members, edges) — exactly-once under
  * replay and crash-mid-commit, the R30 guarantees verbatim since the
  * commit helper is shared. Serving (`hnswServeArtifactOn`) needs no
  * insert-awareness: the next descent simply sees more member rows and
  * more bucket files.
  */
object StreamGraphInsert {

  /** Start inserting `vecs` (a streaming frame of (vec_id BIGINT,
    * v ARRAY&lt;DOUBLE&gt;)) into the layered-graph artifact.
    */
  def start(s: SparkSession, artifact: String, vecs: DataFrame,
            checkpoint: String): StreamingQuery =
    vecs.writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         batchId: Long) =>
          graft.sim.SimQueries.hnswArtifactInsert(s, artifact, b.toDF(),
            batchId)
      }.start()
}
