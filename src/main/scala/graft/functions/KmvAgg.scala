package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** KMV (k-minimum-values / bottom-k) distinct sketch as a one-pass
  * aggregate: keeps the k smallest DISTINCT hash values seen — the
  * cardinality rung of the sketch ladder (Bloom = membership, MG =
  * frequency, KMV = distinct count, and set algebra via theta-sketch
  * arithmetic on the retained values).
  *
  * Distinctness is the point and the difference from E18's TopKAgg: a
  * value already in the buffer is a no-op however often it recurs, so
  * the sketch needs NO distinct pre-shuffle — each map task absorbs
  * its duplicates locally and the exchange carries ≤k longs per group.
  * Merge = absorb (order-free: the bottom-k of a union is the
  * bottom-k of the bottom-k's), so streaming update-mode state is
  * bit-identical to the batch build, like the Bloom face.
  *
  * With the 28-bit md5-prefix hash family (`Shingling.h28`), the
  * retained values — and therefore the (k−1)·2²⁸/h₍ₖ₎ estimate and
  * every theta-sketch derivation — are exactly reproducible in the
  * DuckDB oracle: a hash-checked probabilistic structure, like E23.
  */
case class KmvAgg(item: Expression, k: Int,
                  mutableAggBufferOffset: Int = 0,
                  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvAgg.Buf] {
  require(k > 0, s"k must be positive, got $k")

  import KmvAgg.Buf

  override def createAggregationBuffer(): Buf = new Buf(k)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = item.eval(input)
    if (v != null) buf.offer(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = { a.absorb(b); a }

  override def eval(buf: Buf): Any =
    new GenericArrayData(java.util.Arrays.copyOf(buf.vals, buf.size))

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    var j = 0
    while (j < buf.size) { bb.putLong(buf.vals(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    require(n <= k, s"corrupt KMV buffer: $n entries exceed k=$k")
    val buf = new Buf(k)
    buf.size = n
    var j = 0
    while (j < n) { buf.vals(j) = bb.getLong; j += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(item)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KmvAgg = copy(item = c(0))
  override def withNewMutableAggBufferOffset(o: Int): KmvAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvAgg =
    copy(inputAggBufferOffset = o)
}

object KmvAgg {
  /** Sorted ascending distinct bottom-k. Linear insertion like E18's
    * Buf: k is small, and the common case — a value above the current
    * ceiling of a full buffer — rejects in O(1); the next-common case,
    * a recurring value, rejects at its binary-search probe.
    */
  final class Buf(val k: Int) {
    val vals = new Array[Long](k)
    var size = 0

    def offer(v: Long): Unit = {
      if (size == k && v >= vals(size - 1)) return
      var pos = java.util.Arrays.binarySearch(vals, 0, size, v)
      if (pos >= 0) return // already present: distinct sketch
      pos = -(pos + 1)
      val last = if (size < k) size else k - 1
      var j = last
      while (j > pos) { vals(j) = vals(j - 1); j -= 1 }
      vals(pos) = v
      if (size < k) size += 1
    }

    def absorb(other: Buf): Unit = {
      var j = 0
      while (j < other.size) { offer(other.vals(j)); j += 1 }
    }
  }

  /** Column face: `KmvAgg(item, k)` → ascending array<long>. */
  def apply(item: Column, k: Int): Column =
    ColumnBridge.column(
      KmvAgg(coerce(ColumnBridge.expression(item)), k)
        .toAggregateExpression())

  private def coerce(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)
}
