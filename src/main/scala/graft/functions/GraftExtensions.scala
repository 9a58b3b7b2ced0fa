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
    TableFunctions.inject(ext) // SQL TVF surface for the pipeline operators
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
        // must pass a foldable integral literal (the analyzer-time
        // equivalent of the Column API's Int argument). Errors surface as
        // DATATYPE_MISMATCH — a non-foldable or wrong-typed third argument
        // is a type problem, not an arity one.
        import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
        val sqlExpr = s""""span_corrupt(${children.map(_.sql).mkString(", ")})""""
        val pctExpr = children(2)
        val integral = pctExpr.dataType match {
          case ByteType | ShortType | IntegerType | LongType => true
          case _ => false
        }
        if (!integral)
          throw new AnalysisException(
            errorClass = "DATATYPE_MISMATCH.UNEXPECTED_INPUT_TYPE",
            messageParameters = Map(
              "sqlExpr" -> sqlExpr,
              "paramIndex" -> "third (maskPct)",
              "requiredType" -> "\"INT\" (a foldable integral literal)",
              "inputSql" -> s""""${pctExpr.sql}"""",
              "inputType" -> s""""${pctExpr.dataType.sql}""""))
        if (!pctExpr.foldable)
          throw new AnalysisException(
            errorClass = "DATATYPE_MISMATCH.NON_FOLDABLE_INPUT",
            messageParameters = Map(
              "sqlExpr" -> sqlExpr,
              "inputName" -> "`maskPct`",
              "inputType" -> "\"INT\"",
              "inputExpr" -> s""""${pctExpr.sql}""""))
        val pct = pctExpr.eval() match {
          case i: java.lang.Integer => i.intValue()
          case b: java.lang.Byte    => b.intValue()
          case s: java.lang.Short   => s.intValue()
          case l: java.lang.Long
              if l >= Int.MinValue && l <= Int.MaxValue => l.intValue()
          case other => throw new AnalysisException(
            errorClass = "DATATYPE_MISMATCH.UNEXPECTED_INPUT_TYPE",
            messageParameters = Map(
              "sqlExpr" -> sqlExpr,
              "paramIndex" -> "third (maskPct)",
              "requiredType" -> "\"INT\" (a non-null int-range literal)",
              "inputSql" -> s""""${String.valueOf(other)}"""",
              "inputType" -> s""""${pctExpr.dataType.sql}""""))
        }
        SpanCorrupt(children(0), children(1), pct)
      }
    ))
  }
}
