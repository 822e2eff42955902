package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed point-in-interval join: `left.pt ∈ [right.lo, right.hi]`
  * (plus optional equi-keys).
  *
  * Spark plans a bare range predicate as a BroadcastNestedLoopJoin —
  * O(|L|·|R|) and driver-bound by the broadcast. Bucketing both sides
  * by `value div width` turns it into an equi-join (one shuffle, hash
  * join) with an exact post-filter: each interval explodes to the
  * buckets it overlaps, each point belongs to exactly one bucket, so
  * every qualifying pair meets exactly once — no dedup pass.
  *
  * Pick `width` ≈ the typical interval length: the explode factor is
  * `len/width + 1` and the bucket join stays selective. Works for any
  * long-valued domain (epoch micros, ids, offsets). Bucketing uses
  * exact integer `div` — double `floor(x/w)` is off-by-one-prone past
  * 2^53 (epoch micros live there).
  */
object RangeJoin {

  def pointInInterval(left: DataFrame, right: DataFrame,
                      pt: Column, lo: Column, hi: Column,
                      width: Long,
                      leftKeys: Seq[Column] = Nil,
                      rightKeys: Seq[Column] = Nil): DataFrame = {
    require(width > 0, "width must be positive")
    require(leftKeys.length == rightKeys.length,
      "leftKeys and rightKeys must pair up")
    val l = left
      .withColumn("__pt", pt.cast("long"))
      .withColumn("__bucket", expr(s"__pt div $width"))
    val r = right
      .withColumn("__lo", lo.cast("long"))
      .withColumn("__hi", hi.cast("long"))
      .withColumn("__bucket",
        explode(expr(s"sequence(__lo div $width, __hi div $width)")))
    val keyCond = leftKeys.zip(rightKeys)
      .map { case (a, b) => a === b }
      .foldLeft(l("__bucket") === r("__bucket"))(_ && _)
    l.join(r, keyCond && l("__pt") >= r("__lo") && l("__pt") <= r("__hi"))
      .drop("__bucket", "__pt", "__lo", "__hi")
  }
}
