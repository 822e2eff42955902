package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** E28: HyperLogLog registers as a one-pass aggregate — the
  * fixed-size cardinality rung of the sketch ladder (Bloom =
  * membership, MG = frequency, CM = point frequency, KMV = distinct
  * via retained hashes, HLL = distinct via m BYTES of rank maxima —
  * the sketch whose size does not grow with k accuracy the way KMV's
  * does, and the one every production engine ships).
  *
  * Input is the 60-bit md5-prefix hash (`Shingling.h60`), so the
  * registers are exactly reproducible in the DuckDB oracle: register
  * j = max over hashes with top-p bits = j of (rank of the remaining
  * 54 bits), rank = (55 − bit_length(w)) — `length(bin(w))` is
  * minimal-width in BOTH engines, no libm. Merge = elementwise MAX:
  * commutative, associative and idempotent, so the register array is
  * bit-identical under any partitioning, arrival order OR replay
  * (idempotence is the property Bloom/KMV also have and CM does not —
  * an at-least-once stream face stays exact), and the exchange
  * carries m bytes per group however large the input.
  *
  * The estimate is derived DOWNSTREAM of the registers (see the
  * `sketch_hll` gate): harmonic sum as an exact BIGINT in 2^(55−reg)
  * units, the alpha·m² bias factor as one literal-parenthesized
  * double expression (IEEE-deterministic, the D22 discipline), and
  * the small-range linear-counting branch m·ln(m/V) as a LITERAL
  * lookup table both engines share — ln never runs at query time.
  */
case class HllAgg(hash: Expression, p: Int,
                  mutableAggBufferOffset: Int = 0,
                  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {
  require(p >= 4 && p <= 16, s"precision must be in [4,16], got $p")

  private val m = 1 << p
  private val wBits = 60 - p // rank computed over the low 60−p bits

  override def createAggregationBuffer(): Array[Long] = new Array[Long](m)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = hash.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val idx = (h >>> wBits).toInt & (m - 1)
      val w = h & ((1L << wBits) - 1)
      // rank over wBits bits: bit_length(w) = 64 − nlz(w); w == 0 has
      // nlz 64, giving rank wBits + 1 — the same closed form.
      val rank = java.lang.Long.numberOfLeadingZeros(w) - (63 - wBits)
      if (rank > buf(idx)) buf(idx) = rank
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    require(bytes.length == 8 * m,
      s"corrupt HLL buffer: ${bytes.length} bytes for m=$m")
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](m)
    var i = 0
    while (i < m) {
      buf(i) = bb.getLong
      require(buf(i) >= 0 && buf(i) <= wBits + 1,
        s"corrupt HLL register ${buf(i)} exceeds max rank ${wBits + 1}")
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(hash)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): HllAgg = copy(hash = c(0))
  override def withNewMutableAggBufferOffset(o: Int): HllAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllAgg =
    copy(inputAggBufferOffset = o)
}

object HllAgg {
  /** Column face: `HllAgg(h60, p)` → array<long> of 2^p registers. */
  def apply(hash: Column, p: Int): Column =
    ColumnBridge.column(
      HllAgg(coerce(ColumnBridge.expression(hash)), p)
        .toAggregateExpression())

  private def coerce(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  /** Reference registers in plain Scala, for the property specs. */
  def reference(hashes: Seq[Long], p: Int): Seq[Long] = {
    val m = 1 << p
    val wBits = 60 - p
    val regs = new Array[Long](m)
    hashes.foreach { h =>
      val idx = (h >>> wBits).toInt & (m - 1)
      val w = h & ((1L << wBits) - 1)
      val rank = java.lang.Long.numberOfLeadingZeros(w) - (63 - wBits)
      if (rank > regs(idx)) regs(idx) = rank
    }
    regs.toSeq
  }
}
