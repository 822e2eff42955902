package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** E27: codegen'd Hamming distance over two equal-length strings — the
  * verify kernel of every banded signature family (M8/M10 64-char
  * '0'/'1' hashes; any fixed-width fingerprint).
  *
  * The compositional form `size(filter(sequence(1, n), i ->
  * substring(a,i,1) != substring(b,i,1)))` materializes an n-element
  * sequence array and two single-char UTF8String slices per position
  * per row; on the band-candidate stream (the hot loop of perceptual
  * dedup) that is 3·n allocations per pair. This expression walks the
  * two byte buffers in one allocation-free loop inside whole-stage
  * codegen. Byte-wise compare ≡ char-wise for the ASCII alphabets
  * these hashes use.
  *
  * Null semantics: NULL on length mismatch (a cross-width compare is
  * a bug upstream, and the banded pipelines guarantee equal width by
  * construction) — the spec pins equality with the compositional form
  * on the equal-width domain bit-for-bit.
  */
case class HammingDistance(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"both sides must be string, got ${left.dataType}/${right.dataType}")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String]
    val y = b.asInstanceOf[UTF8String]
    val n = x.numBytes()
    if (n != y.numBytes()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.getByte(i) != y.getByte(i)) acc += 1L
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numBytes();
         |if ($n != $b.numBytes()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.getByte($i) != $b.getByte($i)) $acc++;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}

object HammingDistance {
  /** Column-API face of the expression. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(HammingDistance(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
