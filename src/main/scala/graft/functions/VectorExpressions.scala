package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the vector hot path.
  *
  * The engine's similarity family (ANN top-k, embedding near-dup, SemDedup,
  * IVF assignment) reduces to two scalar kernels: a dot product and an L2
  * norm over `array<double>` columns. The portable formulations —
  * `aggregate(zip_with(x, y, _ * _), 0.0, _ + _)` and a `mapPartitions`
  * row loop — both leave whole-stage codegen: higher-order functions are
  * `CodegenFallback` (an interpreted lambda call per element, plus a
  * materialized `zip_with` intermediate array per pair), and `mapPartitions`
  * forces an InternalRow -> Row encoder boundary that boxes every element
  * through `Seq[Double]`.
  *
  * These expressions generate a primitive loop over the unsafe `ArrayData`
  * (`getDouble(i)` — no boxing, no intermediate array) and stay inside the
  * surrounding WholeStageCodegen span, so a candidate-verification stage is
  * one fused pass: scan -> join -> dot -> filter.
  *
  * Semantics are bit-identical to the HOF formulations (the test oracle):
  * doubles accumulate left-to-right in array order; a null element or a
  * length mismatch yields NULL (what `zip_with`'s null-padding + `null`
  * arithmetic produce). [[GraftExtensions]] additionally registers them as
  * SQL functions `vec_dot` / `vec_norm` via `SparkSessionExtensions`.
  */
object VectorExpressions {

  /** dot(x, y) = Σ x(i)·y(i), left-to-right; NULL on length mismatch. */
  def vecDot(x: Column, y: Column): Column =
    GraftSqlShim.column(DotProduct(GraftSqlShim.expression(x), GraftSqlShim.expression(y)))

  /** ‖x‖₂ = sqrt(Σ x(i)²), accumulated left-to-right. */
  def vecNorm(x: Column): Column =
    GraftSqlShim.column(NormL2(GraftSqlShim.expression(x)))
}

case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[GraftSqlShim.AbstractType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // nullable even for non-null children: length mismatch / null element
  // yields NULL (and keeps ev.isNull a real variable in codegen)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $x.getDouble($i) * $y.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

case class NormL2(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[GraftSqlShim.AbstractType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // null element => NULL
  override def prettyName: String = "vec_norm"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = x.getDouble(i)
      s += v * v
      i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $x.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  final double $v = $x.getDouble($i);
         |  $s += $v * $v;
         |}
         |if (!${ev.isNull}) ${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NormL2 =
    copy(child = newChild)
}
