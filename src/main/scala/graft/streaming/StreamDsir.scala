package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** R21: DSIR data selection AT INGEST — P17's importance-resampling
  * scorer run continuously over arriving documents, with the running
  * top-k selection held as streaming state.
  *
  * The split of work is the production one: the model TRAINS offline
  * on the archive (two B-bounded aggregates — [[graft.pipeline
  * .PipelineQueries.dsirWeightArray]]), and what ships to the stream
  * is a dense B-long literal array. Scoring an arrival is then ONE
  * narrow higher-order expression — hash each bigram to its bucket,
  * look the weight up in the literal, sum — no join, no shuffle, no
  * state; a document's score is known the moment it arrives.
  *
  * The running selection is E18's bounded heap as an UPDATE-mode
  * streaming aggregate: TopKAgg's merge is order-free (the R16
  * argument), so the streamed top-k after any trigger packing is
  * BIT-IDENTICAL to the batch draw over the same corpus — the spec's
  * claim. State = one k-entry heap (a few KB) however long the stream
  * runs; this is "keep the k best documents we have ever seen" as an
  * operator.
  */
object StreamDsir {

  /** Score a (streaming or batch) docs frame of (doc_id, source, text)
    * against a trained weight array: adds `score_micro` and `n_feats`,
    * drops docs with fewer than two tokens (no features — the batch
    * face's contract).
    */
  def score(weights: Array[Long])(docs: DataFrame): DataFrame =
    docs
      .withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) >= 2)
      .withColumn("lam_arr", typedLit(weights.toSeq))
      .withColumn("score_micro", expr(
        "aggregate(transform(sequence(1, size(w)-1), i -> " +
          "element_at(lam_arr, cast(cast(conv(substring(md5(" +
          "concat(element_at(w, i), ' ', element_at(w, i+1))), 1, 7), " +
          s"16, 10) as bigint) % ${graft.pipeline.PipelineQueries.DsirBuckets}" +
          " as int) + 1)), 0L, (acc, x) -> acc + x)"))
      .withColumn("n_feats", (size(col("w")) - 1).cast("long"))
      .drop("w", "lam_arr")

  /** The running top-k selection over a scored frame (streaming:
    * update mode; batch: same expression) — k best (score, doc_id).
    */
  def selection(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy()
      .agg(graft.functions.TopKAgg(col("score_micro").cast("double"),
        col("doc_id"), k).as("top"))
}
