package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** One-pass bounded top-k aggregate: keeps the k best (score, id) pairs
  * per group, ordered by (score DESC, id ASC).
  *
  * The window-function idiom (`row_number() OVER (PARTITION BY g ORDER
  * BY s DESC) <= k`) shuffles and sorts EVERY row of every group; this
  * aggregate keeps at most k entries per group per map task and merges
  * k-lists at combine time, so shuffle volume is k·|groups| regardless
  * of group size — the same partial-aggregation argument as
  * MinHashAgg/SimHashAgg, applied to ranking. Results are identical to
  * the window form (the order is total: score ties break on id), so a
  * window-based oracle checks it exactly.
  */
case class TopKAgg(score: Expression, id: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Buf] {
  require(k > 0, s"k must be positive, got $k")

  import TopKAgg.Buf

  override def createAggregationBuffer(): Buf = new Buf(k)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = { a.absorb(b); a }

  override def eval(buf: Buf): Any =
    new GenericArrayData(Array.tabulate[Any](buf.size) { j =>
      val r = new GenericInternalRow(2)
      r.setDouble(0, buf.scores(j))
      r.setLong(1, buf.ids(j))
      r
    })

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var j = 0
    while (j < buf.size) {
      bb.putDouble(buf.scores(j)); bb.putLong(buf.ids(j)); j += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Buf(k)
    buf.size = n
    var j = 0
    while (j < n) { buf.scores(j) = bb.getDouble; buf.ids(j) = bb.getLong; j += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(score, id)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TopKAgg = copy(score = c(0), id = c(1))
  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
}

object TopKAgg {
  /** Coercing constructor used by both the Column and SQL faces: an
    * INT score/id gets a cast injected at construction instead of a
    * runtime ClassCastException in the executor (AbstractDataType is
    * private[sql], so ImplicitCastInputTypes isn't available here).
    */
  def coerced(score: Expression, id: Expression, k: Int): TopKAgg =
    TopKAgg(
      if (score.dataType == DoubleType) score else Cast(score, DoubleType),
      if (id.dataType == LongType) id else Cast(id, LongType), k)
  /** Sorted bounded list: entries 0..size-1 ordered (score DESC, id
    * ASC). k is small (ranking fan-out), so linear insertion beats a
    * heap's constant factors; the common case — a row worse than the
    * current floor of a full list — rejects in O(1).
    */
  final class Buf(val k: Int) {
    val scores = new Array[Double](k)
    val ids = new Array[Long](k)
    var size = 0

    @inline private def beats(s: Double, i: Long, j: Int): Boolean =
      s > scores(j) || (s == scores(j) && i < ids(j))

    def offer(s: Double, i: Long): Unit = {
      if (size == k && !beats(s, i, size - 1)) return
      var pos = if (size < k) size else k - 1
      while (pos > 0 && beats(s, i, pos - 1)) {
        scores(pos) = scores(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
      }
      scores(pos) = s; ids(pos) = i
      if (size < k) size += 1
    }

    def absorb(other: Buf): Unit = {
      var j = 0
      while (j < other.size) { offer(other.scores(j), other.ids(j)); j += 1 }
    }
  }

  /** Column face: `TopKAgg(score, id, k)` → array<struct<score,id>>. */
  def apply(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      coerced(ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}
