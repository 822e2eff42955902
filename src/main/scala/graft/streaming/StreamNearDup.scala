package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** D12: near-duplicate DETECTION AT INGEST — the streaming face of the
  * MinHash-LSH suite (D3): as documents arrive, emit every candidate
  * pair they form with previously-ingested documents, so dedup
  * verdicts exist the moment the duplicate lands instead of after the
  * nightly batch sweep.
  *
  * Two stages:
  *  - SIGNATURES as a narrow projection: the 32 minima compute per row
  *    with higher-order transforms over the doc's distinct shingle
  *    array — the EXACT arithmetic of the batch `MinHashAgg`
  *    ((a_i·h28+b_i) mod P over the same md5-derived h28), so streamed
  *    band keys are bit-identical to the batch index's
  *    (StreamingSpec proves candidate parity against the real batch
  *    pipeline, which crosses the two implementations).
  *  - BAND BUCKETS as keyed state: one state record per (band,
  *    band_key) holding the bucket's member ids; a new arrival emits
  *    pairs against existing members plus the new arrivals of its own
  *    batch, then joins the bucket. Emission is incremental and
  *    append-safe; a pair surfaces once per shared band (downstream
  *    stores dedup, exactly like the batch `.distinct()`).
  *
  * Scale: state is the LSH band index itself — the same structure the
  * batch job shuffles, held incrementally; a viral band bucket is the
  * D8 hot-shingle story and a production deployment caps bucket size
  * the same way (stop emitting into buckets past the df cap — the
  * pairs there are boilerplate, not near-dups).
  */
object StreamNearDup {

  final case class BandDoc(band: Int, band_key: String, doc_id: Long)
  final case class CandPair(doc_a: Long, doc_b: Long)
  final case class Bucket(docs: Seq[Long])

  import graft.dedup.Shingling.{P, NumHashes, BandRows}

  /** (band, band_key, doc_id) per arriving doc — one narrow map,
    * arithmetic identical to `DedupQueries.minhashBands`.
    */
  def bands(docs: DataFrame): Dataset[BandDoc] = {
    implicit val enc = Encoders.product[BandDoc]
    val nBands = NumHashes / BandRows
    docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .withColumn("hs", expr(
        """transform(
          |  array_distinct(transform(sequence(1, size(w)-2),
          |    i -> concat_ws(' ', slice(w, i, 3)))),
          |  s -> cast(conv(substring(md5(s), 1, 7), 16, 10) as bigint))"""
          .stripMargin))
      .withColumn("sig", expr(
        s"""transform(sequence(0, ${NumHashes - 1}),
           |  i -> array_min(transform(hs,
           |    h -> (((i+1) * 2654435761) % $P * h
           |          + ((i+1) * 2654435789 + 97) % $P) % $P)))"""
          .stripMargin))
      .select(col("doc_id"),
        explode(sequence(lit(0), lit(nBands - 1))).as("band"),
        col("sig"))
      .withColumn("band_key", expr(
        s"array_join(transform(slice(sig, band * $BandRows + 1, " +
          s"$BandRows), x -> cast(x as string)), '-')"))
      .select(col("band").cast("int").as("band"), col("band_key"),
        col("doc_id"))
      .as[BandDoc]
  }

  /** Candidate pairs against the accumulating band index. */
  def candidates(bd: Dataset[BandDoc]): Dataset[CandPair] = {
    implicit val pairEnc = Encoders.product[CandPair]
    implicit val stateEnc = Encoders.product[Bucket]
    bd.groupByKey(b => (b.band, b.band_key))(
        Encoders.tuple(Encoders.scalaInt, Encoders.STRING))
      .flatMapGroupsWithState[Bucket, CandPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, it, state: GroupState[Bucket]) =>
          val existing = state.getOption.map(_.docs).getOrElse(Seq.empty)
          val arrivals = it.map(_.doc_id).toSeq.distinct.sorted
            .filterNot(existing.contains)
          val crossOld = for {
            b <- arrivals; a <- existing
          } yield CandPair(math.min(a, b), math.max(a, b))
          val amongNew = arrivals.combinations(2).map { two =>
            CandPair(two.head, two(1))
          }.toSeq
          if (arrivals.nonEmpty) state.update(Bucket(existing ++ arrivals))
          (crossOld ++ amongNew).iterator
      }
  }

  def apply(docs: DataFrame): Dataset[CandPair] = candidates(bands(docs))
}
