package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated inner equi-join: the (big, skewed) left side gets a
  * deterministic salt derived from its whole row, the (smaller) right
  * side is replicated once per salt — a hot key's rows spread over
  * `nSalts` shuffle partitions instead of melting one task.
  *
  * Join semantics are unchanged (every left row still meets every
  * matching right row exactly once). Use when a bounded number of keys
  * dominates and the right side is too big to broadcast outright but
  * cheap to replicate `nSalts` times; otherwise prefer AQE's skew-join
  * handling (enabled in graft sessions) or a plain broadcast.
  */
object SaltedJoin {

  def inner(left: DataFrame, right: DataFrame, keys: Seq[String],
            nSalts: Int): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    val leftCols = left.columns.toIndexedSeq.map(col)
    val salted = left.withColumn("__salt",
      pmod(xxhash64(leftCols: _*), lit(nSalts)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
