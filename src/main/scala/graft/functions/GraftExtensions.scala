package graft.functions

import org.apache.spark.sql.{AnalysisException, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `SparkSessionExtensions` hook: registers the native vector AND text
  * kernels as SQL functions, so `spark.sql("... vec_dot(a.embedding,
  * b.embedding) ...")`, `html_extract(html)`, `span_corrupt(words, id,
  * pct)`, and `simhash64(text)` work anywhere the DataFrame wrappers in
  * [[VectorExpressions]] / [[TextExpressions|the text kernels]] do — the
  * JobRoutes SQL surface included.
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
    ext.injectFunction((
      new FunctionIdentifier("html_extract"),
      new ExpressionInfo(classOf[HtmlExtract].getName, "html_extract"),
      (children: Seq[Expression]) => {
        requireArity("html_extract", 1, children)
        HtmlExtract(children.head)
      }
    ))
    ext.injectFunction((
      new FunctionIdentifier("span_corrupt"),
      new ExpressionInfo(classOf[SpanCorrupt].getName, "span_corrupt"),
      (children: Seq[Expression]) => {
        requireArity("span_corrupt", 3, children)
        // maskPct is a constructor parameter, not a child: SQL callers
        // must pass a foldable integer (the analyzer-time equivalent of
        // the Column API's Int argument)
        val pct = children(2) match {
          case e if e.foldable && e.dataType ==
              org.apache.spark.sql.types.IntegerType =>
            e.eval() match {
              case i: java.lang.Integer => i.intValue()
              case other => throw new AnalysisException(
                errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
                messageParameters = Map(
                  "functionName" -> "`span_corrupt`",
                  "expectedNum" -> "a non-null INT literal maskPct",
                  "actualNum" -> String.valueOf(other),
                  "docroot" -> "https://spark.apache.org/docs/latest"))
            }
          case _ => throw new AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`span_corrupt`",
              "expectedNum" -> "a foldable INT literal maskPct",
              "actualNum" -> "a non-literal third argument",
              "docroot" -> "https://spark.apache.org/docs/latest"))
        }
        SpanCorrupt(children(0), children(1), pct)
      }
    ))
  }
}
