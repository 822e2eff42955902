package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd dot product over two `array<double>` columns.
  *
  * The compositional form `aggregate(zip_with(a, b, *), 0d, +)` is
  * semantically identical but allocates a zipped array per row — at
  * millions of candidate pairs (dedup/ANN scoring) that allocation
  * dominates. This expression walks both ArrayData buffers in one loop,
  * no allocation, inside whole-stage codegen. Summation order is the
  * same left-to-right fold, so DuckDB `list_dot_product` oracles still
  * match bit-for-bit.
  *
  * Null semantics deliberately mirror the fold EXACTLY, so
  * [[graft.plans.RewriteDotProductFold]] is a sound rewrite for any
  * input: `zip_with` pads a shorter array with nulls and `x * null`
  * poisons the sum, so the fold is NULL whenever the lengths differ or
  * any element is null — and so is this expression.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  /** NULL on length mismatch / null element, even for non-null inputs. */
  override def nullable: Boolean = true

  /** Skip the per-element null branch when the schema rules nulls out. */
  private def elementsNullable: Boolean =
    Seq(left, right).exists(_.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => true
    })
  override def checkInputDataTypes()
  : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == ArrayType(DoubleType, false) ||
      left.dataType == ArrayType(DoubleType, true)) {
      if (right.dataType == ArrayType(DoubleType, false) ||
        right.dataType == ArrayType(DoubleType, true)) {
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      } else {
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"right must be array<double>, got ${right.dataType}")
      }
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"left must be array<double>, got ${left.dataType}")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (elementsNullable && (x.isNullAt(i) || y.isNullAt(i))) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val nullCheck = if (elementsNullable) {
        s"""if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"""
      } else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $acc;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-API face of the expression. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
