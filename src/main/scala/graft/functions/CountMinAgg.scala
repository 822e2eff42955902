package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** E26: one-pass Count-Min sketch build as an aggregate — the
  * point-frequency complement to MisraGriesAgg (E22 answers "which
  * keys are frequent", CM answers "how often is THIS key", for any
  * key, in d·w counters regardless of cardinality). Buffer = d rows ×
  * w counters of longs; update adds 1 at position h_r(x) per row;
  * merge = elementwise ADD — commutative and associative, so the
  * sketch is bit-identical under any partitioning or arrival order
  * (the R13 streaming-parity property, and what makes a DuckDB oracle
  * able to reproduce the EXACT counter matrix and estimates:
  * cross-engine, a verified probabilistic count).
  *
  * Hash family: row r of item x is the Shingling/Bloom 28-bit
  * md5-prefix `conv(substring(md5(concat(r, '-', x)), 1, 7), 16, 10)
  * % w` — SQL-expressible in both engines. The CM guarantee
  * (estimate ≥ true count, overshoot ≤ εN with prob 1−δ at
  * w = e/ε, d = ln 1/δ) is checkable IN the gate output because both
  * sides ride along.
  */
case class CountMinAgg(item: Expression, d: Int, w: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {
  require(d > 0, s"depth must be positive, got $d")
  require(w >= 2 && (w & (w - 1)) == 0,
    s"width must be a power of two >= 2, got $w")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = item.eval(input)
    if (v != null) {
      val s = v.toString
      var r = 1
      while (r <= d) {
        buf((r - 1) * w + CountMinAgg.position(r, s, w)) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    require(bytes.length == 8 * d * w,
      s"corrupt CM buffer: ${bytes.length} bytes for d=$d w=$w")
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(d * w)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(item)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): CountMinAgg = copy(item = c(0))
  override def withNewMutableAggBufferOffset(o: Int): CountMinAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinAgg =
    copy(inputAggBufferOffset = o)
}

object CountMinAgg {
  /** Counter column of hash row r for item s: the 28-bit md5-prefix
    * family (Shingling.h28 / BloomFilterAgg.position), mod w —
    * bit-identical to `conv(substring(md5(concat(r, '-', x)), 1, 7),
    * 16, 10) % w` in both engines.
    */
  def position(r: Int, s: String, w: Int): Int = {
    val dg = MessageDigest.getInstance("MD5")
      .digest(s"$r-$s".getBytes(UTF_8))
    val v = ((dg(0) & 0xff) << 20) | ((dg(1) & 0xff) << 12) |
      ((dg(2) & 0xff) << 4) | ((dg(3) & 0xff) >>> 4)
    v & (w - 1)
  }

  /** Column face: `CountMinAgg(item, d, w)` → array<long> of d·w
    * counters, row-major.
    */
  def apply(item: Column, d: Int, w: Int): Column =
    ColumnBridge.column(
      CountMinAgg(ColumnBridge.expression(item), d, w)
        .toAggregateExpression())

  /** Point estimate of `c` against a COLLECTED counter matrix: min
    * over the d rows of counter[r][h_r(c)], as pure codegen arithmetic
    * over the broadcast literal array — the serving face, like the
    * Bloom probe: no join, no shuffle, 8·d·w bytes shipped once.
    */
  def estimate(countersCol: String, c: String, d: Int, w: Int)
  : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{expr, least}
    least((1 to d).map { r =>
      val pos = s"pmod(cast(conv(substring(md5(concat('$r-', $c)), 1, 7)," +
        s" 16, 10) as bigint), $w)"
      expr(s"element_at($countersCol, cast(${(r - 1) * w} + $pos as int) + 1)")
    }: _*)
  }
}
