package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Misra-Gries heavy-hitters sketch as a one-pass aggregate: at most
  * `k` (item, lower-bound count) entries per aggregation state.
  *
  * The guarantee that makes it usable as a PRUNING pass: after
  * processing n rows, every item with true frequency > n/(k+1) is
  * present in the summary, and each kept count undercounts its item by
  * at most n/(k+1) — and both survive arbitrary merges (the mergeable-
  * summaries combine: add counts, then subtract the (k+1)-th largest
  * and drop non-positives; Agarwal et al., PODS'12). Summary CONTENT
  * depends on partitioning, so queries must treat it as a candidate
  * set and verify exactly — the gate query `q_heavy_hitters` does
  * (sketch → broadcast semi-join → exact count → threshold filter),
  * which makes its output deterministic and plain-SQL-checkable while
  * the sketch bounds state at k entries per task however large the
  * key space. The same two-phase shape LSH/MinHash use: approximate
  * candidate generation, exact verification on candidates only.
  */
case class MisraGriesAgg(item: Expression, k: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesAgg.Buf] {
  require(k > 0, s"k must be positive, got $k")

  import MisraGriesAgg.Buf

  override def createAggregationBuffer(): Buf = new Buf(k)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = item.eval(input)
    if (v != null) buf.offer(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = { a.absorb(b); a }

  /** Entries ordered (count DESC, item ASC) — a deterministic
    * rendering of the (partition-dependent) summary.
    */
  override def eval(buf: Buf): Any = {
    val entries = buf.counts.toArray.sortBy { case (i, c) => (-c, i) }
    new GenericArrayData(entries.map { case (i, c) =>
      val r = new GenericInternalRow(2)
      r.setLong(0, i)
      r.setLong(1, c)
      r
    })
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val entries = buf.counts.toArray
    val bb = ByteBuffer.allocate(4 + 16 * entries.length)
    bb.putInt(entries.length)
    entries.foreach { case (i, c) => bb.putLong(i); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    // eval/absorb assume the <=k invariant; a corrupted or
    // version-skewed shuffle buffer must fail loudly, not produce a
    // silently-overweight summary
    require(n <= k, s"corrupt MG buffer: $n entries exceeds k=$k")
    val buf = new Buf(k)
    var j = 0
    while (j < n) { buf.counts(bb.getLong) = bb.getLong; j += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", LongType, nullable = false),
    StructField("lb", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(item)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MisraGriesAgg = copy(item = c(0))
  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
}

object MisraGriesAgg {
  final class Buf(val k: Int) {
    val counts = mutable.LongMap.empty[Long]

    /** Classic MG step: known item increments; a new item inserts while
      * below k, else every counter decrements (zeros evicted) — the
      * O(k) amortized-O(1) form.
      */
    def offer(item: Long): Unit = {
      counts.get(item) match {
        case Some(c) => counts(item) = c + 1
        case None if counts.size < k => counts(item) = 1L
        case None =>
          val dead = mutable.ArrayBuffer.empty[Long]
          counts.foreachEntry { (i, c) =>
            if (c <= 1L) dead += i else counts(i) = c - 1
          }
          dead.foreach(counts.remove)
      }
    }

    /** Mergeable-summaries combine: pointwise add, then subtract the
      * (k+1)-th largest count and drop non-positives — preserves both
      * MG guarantees under any merge tree.
      */
    def absorb(other: Buf): Unit = {
      other.counts.foreachEntry { (i, c) =>
        counts(i) = counts.getOrElse(i, 0L) + c
      }
      if (counts.size > k) {
        val vals = counts.values.toArray
        java.util.Arrays.sort(vals)
        val m = vals(vals.length - 1 - k) // (k+1)-th largest
        val dead = mutable.ArrayBuffer.empty[Long]
        counts.foreachEntry { (i, c) =>
          if (c - m <= 0L) dead += i else counts(i) = c - m
        }
        dead.foreach(counts.remove)
      }
    }
  }

  /** Column face: `MisraGriesAgg(item, k)` → array<struct<item,lb>>. */
  def apply(item: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(
        {
          val e = ColumnBridge.expression(item)
          if (e.dataType == LongType) e else Cast(e, LongType)
        }, k).toAggregateExpression())
}
