package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** R35: BPE DECODE at serve time — T30's round-trip run continuously
  * over arriving token sequences (the shape of a generation or
  * inspection stream: each row is a complete (seq_id, token_ids)
  * sequence). The deployment shape is the frozen-tokenizer one again,
  * but where R24 joins a Heaps'-law word table, decode needs only the
  * SYMBOL table — tokenizer-vocab-sized, i.e. the codebook
  * discipline: collect it ONCE at start-up into a map literal, and
  * the per-trigger work is a single narrow projection. Zero shuffle,
  * zero state, append-mode safe on any stream — a sequence decodes
  * entirely inside its own row (ids → symbols via the literal map,
  * word boundaries recovered from the end-of-word mark, words
  * rejoined with single spaces — T30's reassembly verbatim).
  *
  * An id the symbol table has never issued decodes to nothing and
  * increments the row's `n_unknown` — the monitored drift number, the
  * R24 OOV discipline on the decode side (a generator emitting ids
  * outside the deployed tokenizer is an incident, not a crash).
  */
object StreamBpeDecode {

  /** Build the per-trigger decoder from the deployed symbol table
    * ((sym, tok_id) — T29/T30's dense ranks). Collects once; the
    * returned function is a narrow stream-safe projection over
    * (seq_id BIGINT, token_ids ARRAY&lt;BIGINT&gt;) frames.
    */
  def decoder(symIds: DataFrame): DataFrame => DataFrame = {
    val m: Map[Long, String] = symIds.collect()
      .map(r => r.getAs[Long]("tok_id") -> r.getAs[String]("sym")).toMap
    val lit0 = typedLit(m)
    (seqs: DataFrame) =>
      seqs
        .withColumn("n_unknown",
          size(filter(col("token_ids"),
            t => element_at(lit0, t).isNull)).cast("long"))
        .withColumn("allsym", concat_ws("",
          transform(col("token_ids"),
            t => coalesce(element_at(lit0, t), lit("")))))
        .withColumn("decoded",
          array_join(filter(
            split(col("allsym"), graft.text.TextQueries.BpeMark),
            w => length(w) > lit(0)), " "))
        .select(col("seq_id"),
          size(col("token_ids")).cast("long").as("n_tokens"),
          col("n_unknown"), md5(col("decoded")).as("decoded_md5"),
          col("decoded"))
  }
}
