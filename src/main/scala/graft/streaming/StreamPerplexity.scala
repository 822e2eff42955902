package graft.streaming

import org.apache.spark.sql.DataFrame

/** R23: reference-LM perplexity scoring AT INGEST — T15's held-out
  * scorer run continuously over arriving documents, against a model
  * trained OFFLINE on the archive. This is the production split CCNet
  * describes: the reference model is fit once on a trusted corpus
  * (here [[graft.text.TextQueries.jmTrain]] — bigram/context/unigram
  * count frames plus two exact scalars), and the ingest path only
  * SCORES, so quality verdicts (P22's band) are available the moment
  * a document arrives instead of after the next batch sweep.
  *
  * Streaming shape: the three reference-count joins are STREAM-STATIC
  * left joins (the static side is the trained model — no watermark
  * needed, no stream-stream buffering), and the per-document aggregate
  * runs in UPDATE mode. A document streams as one row and explodes to
  * its bigrams inside its own trigger, so each doc_id's aggregate
  * receives everything it will ever see in that trigger and the
  * update-mode emission is final — which is why the streamed rows are
  * BIT-IDENTICAL to the batch scorer on the same corpus under any
  * trigger packing (StreamingSpec R23). A deployment that streams
  * forever adds a watermark on arrival time purely to expire the
  * per-doc aggregation state; the scores themselves never depend on
  * trigger boundaries.
  */
object StreamPerplexity {

  /** Score a streaming (doc_id, text) frame against a trained JM
    * model: (doc_id, n_bigrams, n_unseen, nll_micro), one row per
    * arriving ≥2-token document.
    */
  def score(m: graft.text.TextQueries.JmModel)(docs: DataFrame): DataFrame =
    graft.text.TextQueries.jmScore(m)(docs)
}
