package graft.functions

import java.nio.ByteBuffer

import graft.dedup.Shingling
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** One-pass MinHash signature aggregate: for a group's 28-bit element
  * hashes, computes `min((a_i·h + b_i) mod P)` for all k hash functions
  * in a single traversal with a k-long mutable buffer.
  *
  * The compositional form explodes each element ×k through a
  * (group, i) hash aggregate — a k-fold blow-up of shuffle rows. This
  * aggregate keeps the map side at one buffer per group, merges by
  * element-wise min, and emits the same values (min is
  * order-independent), so the DuckDB oracle is unchanged.
  */
case class MinHashAgg(child: Expression,
                      k: Int = Shingling.NumHashes,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val P = Shingling.P
  // same parameter derivation as Shingling.hashA/hashB
  private val as: Array[Long] =
    Array.tabulate(k)(i => ((i + 1) * 2654435761L) % P)
  private val bs: Array[Long] =
    Array.tabulate(k)(i => ((i + 1) * 2654435789L + 97L) % P)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < k) {
        val m = (as(i) * h + bs(i)) % P
        if (m < buf(i)) buf(i) = m
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MinHashAgg = copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): MinHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAgg =
    copy(inputAggBufferOffset = o)
}

object MinHashAgg {
  /** Column face: `minhash_sig(h28Column)` → array<bigint> of k mins. */
  def apply(h: Column): Column =
    ColumnBridge.column(
      MinHashAgg(ColumnBridge.expression(h)).toAggregateExpression())
}
