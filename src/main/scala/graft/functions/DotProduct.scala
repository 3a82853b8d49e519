package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd dot product over two double arrays — the hot inner loop
  * of every cosine-similarity operator ([[graft.operators.Dedup]],
  * [[graft.operators.Similarity]]).
  *
  * Semantics are identical to the HOF formulation
  * `aggregate(zip_with(a,b,(x,y)=>x*y), 0.0, (acc,v)=>acc+v)` on
  * equal-length arrays: a strict left-to-right IEEE double fold, which is
  * also exactly what DuckDB's `list_dot_product` computes — so swapping
  * this in changes nothing bit-wise, only speed. The HOF path can't enter
  * whole-stage codegen (lambda functions evaluate interpreted per element,
  * with an ArrayData allocation per zip); this expression compiles to a
  * primitive double loop. Measured ~10× on the sf0.1 brute-force pair scan.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_product requires array<double> arguments, got " +
        s"${left.dataType} / ${right.dataType}")
  }

  /** Mirrors the HOF formulation exactly: mismatched lengths or a null
    * element yield NULL (zip_with pads with null; null*x propagates), never
    * a silently-truncated number. */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
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
      // element null checks only emitted when the static type allows nulls
      val mayBeNull = Seq(left, right).exists(_.dataType match {
        case ArrayType(_, cn) => cn
        case _ => true
      })
      val nullCheck =
        if (mayBeNull)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
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
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
