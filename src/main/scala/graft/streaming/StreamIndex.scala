package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** R10: incremental inverted-index maintenance — the streaming face of
  * the retrieval suite (T6 BM25 / T9 TF-IDF, round-3 verdict's
  * "missing #4"). Documents arrive on the tape as `doc_id|text`
  * payloads; two UPDATE-mode aggregations maintain the index's two
  * tables, each micro-batch emitting only the CHANGED rows — exactly
  * the upsert stream a serving store (the broadcast df table / posting
  * store the batch queries rebuild per run) consumes to stay current:
  *
  *  - `dfUpdates`:  word → document frequency. The (doc, word) pairs
  *    dedup through `dropDuplicates` BEFORE the count (a document
  *    contributes once per word however often the word repeats), the
  *    R6 at-least-once discipline applied inside the document.
  *  - `tfUpdates`: (doc_id, word) → term frequency — the postings.
  *
  * State: the df dedup holds one fingerprint per distinct (doc, word);
  * the counts hold one row per key — the same cardinalities the batch
  * index materializes, held incrementally. Shuffles carry words and
  * ids, never document text.
  */
object StreamIndex {

  /** `doc_id|text` tape payloads → (doc_id, text). */
  def docs(tape: DataFrame): DataFrame =
    tape.select(split(decode(col("payload"), "UTF-8"), "\\|", 2).as("p"))
      .select(element_at(col("p"), 1).cast("long").as("doc_id"),
        element_at(col("p"), 2).as("text"))

  private def pairs(tape: DataFrame): DataFrame =
    docs(tape).select(col("doc_id"),
      explode(split(col("text"), " ")).as("word"))

  /** Changed (word, df) rows per micro-batch (update output mode). */
  def dfUpdates(tape: DataFrame): DataFrame =
    pairs(tape).dropDuplicates("doc_id", "word")
      .groupBy(col("word")).agg(count(lit(1)).as("df"))

  /** Changed (doc_id, word, tf) posting rows per micro-batch. */
  def tfUpdates(tape: DataFrame): DataFrame =
    pairs(tape).groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))

  /** Batch twins over the same decoded docs frame, for parity specs. */
  def dfBatch(docsDf: DataFrame): DataFrame =
    docsDf.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .distinct()
      .groupBy(col("word")).agg(count(lit(1)).as("df"))

  def tfBatch(docsDf: DataFrame): DataFrame =
    docsDf.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
}
