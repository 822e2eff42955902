package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** One-pass Bloom-filter build as an aggregate: `m` bits (a long-word
  * array), `k` md5-derived hash functions, merge = bitwise OR — the
  * ingest-time pre-filter a 100 TB archive runs before exact dedup
  * (probe the filter for "definitely new" and only route MAYBE-seen
  * payloads into the exact md5 ledger; false positives cost an extra
  * exact check, never a wrong answer).
  *
  * Hash portability is the point: position j of item x is
  * `conv(substring(md5(concat(j, '-', x)), 1, 7), 16, 10) % m` — the
  * same 28-bit md5-prefix family Shingling uses — so a DuckDB oracle
  * reproduces the EXACT bit set and membership verdicts, and the gate
  * can hash-check a probabilistic data structure. The built filter is
  * m/8 bytes however large the input (2⁶ KB at m=2¹⁶): collected once
  * and re-broadcast as a literal, probing is pure codegen bit
  * arithmetic — no join, no shuffle.
  */
case class BloomFilterAgg(item: Expression, m: Int, k: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {
  // the buffer layout is m/64 long words, so m below 64 would build a
  // zero-length buffer and fail at the first update() instead of here
  require(m >= 64 && (m & (m - 1)) == 0,
    s"m must be a power of two >= 64, got $m")
  require(k > 0, s"k must be positive, got $k")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](m / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = item.eval(input)
    if (v != null) {
      val s = v.toString
      var j = 1
      while (j <= k) {
        val pos = BloomFilterAgg.position(j, s, m)
        buf(pos >>> 6) |= (1L << (pos & 63))
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(m / 64)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(item)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): BloomFilterAgg = copy(item = c(0))
  override def withNewMutableAggBufferOffset(o: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = o)
}

object BloomFilterAgg {
  /** Bit position of hash j for item s: the integer value of the first
    * 7 hex chars (28 bits) of md5("j-" + s), mod m — bit-identical to
    * `conv(substring(md5(concat(j, '-', x)), 1, 7), 16, 10) % m` in
    * both engines (m is a power of two and the value nonnegative, so
    * mod == pmod).
    */
  def position(j: Int, s: String, m: Int): Int = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s"$j-$s".getBytes(UTF_8))
    val v = ((d(0) & 0xff) << 20) | ((d(1) & 0xff) << 12) |
      ((d(2) & 0xff) << 4) | ((d(3) & 0xff) >>> 4)
    v & (m - 1)
  }

  /** Column face: `BloomFilterAgg(item, m, k)` → array<long> words. */
  def apply(item: Column, m: Int, k: Int): Column =
    ColumnBridge.column(
      BloomFilterAgg(ColumnBridge.expression(item), m, k)
        .toAggregateExpression())

  /** Membership probe of `c` against a COLLECTED filter, as pure
    * codegen bit arithmetic over the broadcast literal words — the
    * serving face: no join, no shuffle, m/8 bytes shipped once.
    * `wordsCol` must reference a column bound to the words literal.
    */
  def probe(wordsCol: String, c: String, m: Int, k: Int)
  : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.expr
    (1 to k).map { j =>
      val pos = s"pmod(cast(conv(substring(md5(concat('$j-', $c)), 1, 7)," +
        s" 16, 10) as bigint), $m)"
      expr(s"(shiftrightunsigned(element_at($wordsCol, " +
        s"cast($pos div 64 as int) + 1), cast($pos % 64 as int)) & 1) = 1")
    }.reduce(_ && _)
  }
}
