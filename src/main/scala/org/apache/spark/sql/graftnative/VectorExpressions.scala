package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the float-vector dot product — the ANN
  * hot path of graft's similarity operators. The higher-order-function
  * formulation (`aggregate(zip_with(a,b,*),0d,+)`) allocates an
  * intermediate array and evaluates lambdas per element in interpreted
  * mode; this expression generates one fused Java loop via `doGenCode`
  * (with an interpreted `nullSafeEval` fallback), keeping the similarity
  * kernel inside whole-stage codegen.
  *
  * Accumulation is a sequential left-to-right fold of exact
  * `(double)a[i] * (double)b[i]` products — bit-identical to the HOF
  * formulation and to the DuckDB `list_reduce` oracle mirror (see
  * graft.Queries determinism recipe).
  *
  * Lives under `org.apache.spark.sql` because `ExpressionUtils`/
  * `AbstractDataType` are `private[sql]` in Spark 4.
  */
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def dataType: DataType = DoubleType

  // result can be NULL (length mismatch / null element) even when both
  // input arrays are non-nullable — without this override Spark would
  // treat the expression as non-nullable and the codegen isNull
  // assignment would be dead
  override def nullable: Boolean = true

  // Null semantics match the HOF formulation exactly (zip_with pads
  // length-mismatched arrays with null; null poisons the fold): result is
  // NULL when lengths differ or any element is null.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = ($n != $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression)
      : Expression = copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column-level API: exact sequential-fold dot product of two float arrays. */
  def dot_f(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProductFloat(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
