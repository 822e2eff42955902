package graft.sim

import graft.functions.VectorFunctions.dot
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Random-hyperplane LSH shared by `knn_lsh` (S3) and the bucketed
  * embedding dedup (D5): 16 sign bits per vector, banded 4×4, so two
  * vectors land in the same band bucket with probability
  * (1 - θ/π)^4 per band — high-cosine pairs collide with near
  * certainty, unrelated ones rarely.
  *
  * The plane matrix is a deterministic md5-derived CONSTANT, computed
  * once on the driver and embedded as a literal so each row's
  * signature is `NumPlanes` codegen'd DotProducts — no per-row md5, no
  * explode, no shuffle. The same formula is restated in DuckDB SQL by
  * the oracles (`planesSql`), and both engines fold the dot product
  * left-to-right over identical exact-multiple-of-0.001 values, so the
  * sign bits are bit-for-bit reproducible cross-engine.
  */
object Hyperplanes {

  val NumPlanes = 16 // signature bits
  val Bands = 4 // 4 bands × 4 bits
  val BandBits: Int = NumPlanes / Bands
  val BandMask: Int = (1 << BandBits) - 1

  /** md5-derived hyperplane component d of plane j, in [-1, 1] — the
    * driver-side twin of the oracle's
    * `(('0x'||substr(md5(j||'-'||d),1,7))::BIGINT % 2001 - 1000)/1000.0`
    * (7 hex digits = 28 bits, so the value is exact in a Long and the
    * quotient is an exact multiple of 0.001 in a Double).
    */
  def planeComponent(j: Int, d: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$j-$d".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(0, 7), 16) % 2001 - 1000) / 1000.0
  }

  /** The NumPlanes×dim constant plane matrix. */
  def matrix(dim: Int): Seq[Seq[Double]] =
    (0 until NumPlanes).map(j => (0 until dim).map(d => planeComponent(j, d)))

  /** Signature column: bit j set iff v·plane_j ≥ 0. Scale is
    * irrelevant to the sign, so callers may pass raw or normalized
    * vectors as long as the oracle does the same.
    */
  def signature(v: Column, dim: Int): Column = {
    val planes = matrix(dim)
    (0 until NumPlanes)
      .map(j => when(dot(v, typedLit(planes(j))) >= 0, lit(1L << j))
        .otherwise(lit(0L)))
      .reduce(_ + _)
  }

  /** Band bucket key: BandBits-wide slice `band` of the signature. */
  def bandKey(sig: Column, band: Column): Column =
    call_function("shiftright", sig, band * lit(BandBits))
      .bitwiseAND(lit(BandMask.toLong))

  /** The oracle-side signature pipeline over a view `src(id, v)`:
    * yields `sigs(id, sig)`. Kept here so the two gate queries that
    * band on hyperplane signs state the SAME SQL.
    */
  def sigsSql(src: String): String = s"""
    sigs AS (
      SELECT id,
             sum(CASE WHEN list_dot_product(v, list_transform(range(0, len(v)), d ->
                   (('0x' || substring(md5(j::VARCHAR || '-' || d::VARCHAR),
                     1, 7))::BIGINT % 2001 - 1000) / 1000.0)) >= 0
                 THEN (1::BIGINT << j) ELSE 0 END) AS sig
      FROM (SELECT id, v, unnest(range(0, $NumPlanes)) AS j FROM $src)
      GROUP BY id),
    bands AS (
      SELECT id, sig, band, (sig >> (band * $BandBits)) & $BandMask AS bkey
      FROM (SELECT id, sig, unnest(range(0, $Bands)) AS band FROM sigs))"""
}
