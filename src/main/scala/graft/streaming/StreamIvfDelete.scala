package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** R32: streaming index deletes — S31's tombstones written AT INGEST,
  * closing the maintenance triangle R30 opened: R30 grows the deployed
  * index continuously, R32 shrinks it continuously, S31's compaction
  * reconciles offline. Production vector stores take deletes as a
  * stream (GDPR erasure queues, moderation pipelines, TTL sweeps);
  * each micro-batch appends its ids to the artifact's tombstone table
  * — O(batch) metadata, postings untouched, no file rewritten — and
  * every serving path that reads tombstones (`ivfServeArtifactDeleted`)
  * observes a delete from the trigger after its arrival.
  *
  * Idempotence makes the replay caveat R30 carries VANISH here: a
  * trigger replayed after a failure appends duplicate tombstone rows,
  * and the tombstone read deduplicates (`distinct`) — masking a masked
  * vector is a no-op, so at-least-once delivery IS exactly-once
  * semantics. Compaction retires duplicates with everything else.
  */
object StreamIvfDelete {

  /** Start applying `ids` (a streaming frame with a `vec_id BIGINT`
    * column) as tombstones on the IVF artifact at `artifact`.
    */
  def start(s: SparkSession, artifact: String, ids: DataFrame,
            checkpoint: String): StreamingQuery =
    ids.writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         _: Long) =>
          graft.sim.SimQueries.ivfDelete(s, artifact, b.toDF())
          ()
      }.start()
}
