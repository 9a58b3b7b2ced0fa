package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** `SparkSessionExtensions` hook: registers the native vector kernels as
  * SQL functions, so `spark.sql("... vec_dot(a.embedding, b.embedding) ...")`
  * works anywhere the DataFrame wrappers in [[VectorExpressions]] do.
  *
  * Wire up with `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * on the session builder (all graft entry points do).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteVectorHofs)
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(children(0), children(1))
    ))
    ext.injectFunction((
      new FunctionIdentifier("vec_norm"),
      new ExpressionInfo(classOf[NormL2].getName, "vec_norm"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        NormL2(children.head)
    ))
  }
}
