package org.apache.spark.sql.graft

import graft.expressions.Kernels
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the embedding hot path.
  *
  * The HOF spelling (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) walks
  * each array three times for a cosine, materializes the intermediate
  * products array, and evaluates the lambda interpreted per element with
  * no subexpression elimination (a measured trap — see the minhash k×
  * hashing bill). These kernels are one fused loop over the raw
  * `ArrayData`, and because each accumulator is still a left fold in
  * component index order, the result is BIT-IDENTICAL to the HOF
  * spelling — the DuckDB oracle's `list_reduce` reproduces it exactly,
  * so swapping them in changes no hashes (asserted by ExpressionSpec).
  *
  * Results are nullable (length mismatch / NULL element / zero-norm
  * cosine), so codegen goes through `nullSafeCodeGen` with a boxed
  * return rather than `defineCodeGen`.
  */
private[graft] trait VecBinaryOp extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  /** Kernel method name on [[Kernels]], e.g. "vecDot". */
  def kernel: String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("res")
      s"""
         |java.lang.Double $r = graft.expressions.Kernels.$kernel($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })
}

/** Ordered-fold dot product of two equal-length double arrays. */
case class VecDot(left: Expression, right: Expression) extends VecBinaryOp {
  override def kernel: String = "vecDot"
  override def prettyName: String = "vec_dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.vecDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity; NULL on zero norms (try_divide semantics). */
case class VecCosine(left: Expression, right: Expression) extends VecBinaryOp {
  override def kernel: String = "vecCosine"
  override def prettyName: String = "vec_cosine"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.vecCosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecCosine =
    copy(left = newLeft, right = newRight)
}

/** L2 norm (sqrt of the ordered fold of squares). */
case class VecL2Norm(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_l2norm"
  override protected def nullSafeEval(a: Any): Any =
    Kernels.vecL2Norm(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("res")
      s"""
         |java.lang.Double $r = graft.expressions.Kernels.vecL2Norm($a);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): VecL2Norm =
    copy(child = newChild)
}
