package graft.functions

import org.apache.spark.sql.{AnalysisException, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `SparkSessionExtensions` hook: registers the native vector kernels as
  * SQL functions, so `spark.sql("... vec_dot(a.embedding, b.embedding) ...")`
  * works anywhere the DataFrame wrappers in [[VectorExpressions]] do.
  *
  * Wire up with `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * on the session builder (all graft entry points do).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Wrong arity must surface as the standard analyzer error naming the
    * function (`WRONG_NUM_ARGS`), not an `IndexOutOfBoundsException` from
    * the builder body — SQL authors see `vec_dot(a)` as a query mistake,
    * not an engine crash.
    */
  private def requireArity(name: String, expected: Int,
                           children: Seq[Expression]): Unit =
    if (children.length != expected)
      throw new AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"`$name`",
          "expectedNum" -> expected.toString,
          "actualNum" -> children.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteVectorHofs)
    ext.injectOptimizerRule(_ => graft.plans.RewriteRankFilterToTopK)
    ext.injectPlannerStrategy(_ => new graft.plans.GroupTopKStrategy)
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        requireArity("vec_dot", 2, children)
        DotProduct(children(0), children(1))
      }
    ))
    ext.injectFunction((
      new FunctionIdentifier("vec_norm"),
      new ExpressionInfo(classOf[NormL2].getName, "vec_norm"),
      (children: Seq[Expression]) => {
        requireArity("vec_norm", 1, children)
        NormL2(children.head)
      }
    ))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => {
        requireArity("simhash64", 1, children)
        SimHash64(children.head)
      }
    ))
  }
}
