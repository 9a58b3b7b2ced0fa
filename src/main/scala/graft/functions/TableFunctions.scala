package graft.functions

import org.apache.spark.sql.{AnalysisException, DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL-callable table-function entry points for the most-used pipeline
  * operators — the `spark.sql` surface the library-only Scala API lacked.
  * Each TVF names its input table (any catalog table or temp view) and
  * builds the SAME logical plan the library call produces, so SQL users
  * get the identical operator — identical output, identical physical plan
  * (round-trip specs in TableFunctionsSpec assert equality with the
  * library calls):
  *
  *   SELECT * FROM graft_dedup_minhash('docs', 'doc_id', 'text')
  *   SELECT * FROM graft_quantile_group('li', 'l_returnflag', 'l_quantity', '25,50,75')
  *   SELECT * FROM graft_topk_group('docs', 'lang,source', 'n_chars desc,doc_id asc', 3)
  *   SELECT * FROM graft_bloom_join('lineitem', 'dim', 'l_orderkey', 'o_orderkey')
  *   SELECT * FROM graft_domain_cap('pages', 'doc_id', 'url', 7)
  *
  * Arguments must be foldable literals (table names, column lists, ints) —
  * the TVF expands at analysis time, exactly like `range(...)`. List
  * arguments are comma-separated; `graft_topk_group`'s order list takes
  * `col asc` / `col desc` entries (direction required — a silent default
  * would hide a reversed sort). Note `graft_bloom_join` builds the dim
  * Bloom filter eagerly while the query is analyzed (the same bounded
  * driver collect the library call performs).
  */
object TableFunctions {

  private def wrongArity(name: String, expected: Int, actual: Int): Nothing =
    throw new AnalysisException(
      errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
      messageParameters = Map(
        "functionName" -> s"`$name`",
        "expectedNum" -> expected.toString,
        "actualNum" -> actual.toString,
        "docroot" -> "https://spark.apache.org/docs/latest"))

  private def str(name: String, args: Seq[Expression], i: Int): String =
    args(i) match {
      case Literal(s: UTF8String, StringType) => s.toString
      case other => throw new IllegalArgumentException(
        s"$name: argument ${i + 1} must be a string literal, got $other")
    }

  private def int(name: String, args: Seq[Expression], i: Int): Int =
    args(i) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"$name: argument ${i + 1} must be an integer literal, got $other")
    }

  private def csv(s: String): Seq[String] =
    s.split(',').map(_.trim).filter(_.nonEmpty).toSeq

  private def tvf(name: String, arity: Int)(
      build: (SparkSession, Seq[Expression]) => DataFrame)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan) =
    (new FunctionIdentifier(name),
      new ExpressionInfo(TableFunctions.getClass.getName, name),
      (args: Seq[Expression]) => {
        if (args.length != arity) wrongArity(name, arity, args.length)
        // the TVF expands during analysis of the enclosing query: build
        // the DataFrame against the active session and splice its
        // (unanalyzed) logical plan into the outer tree
        build(SparkSession.active, args).queryExecution.logical
      })

  def inject(ext: SparkSessionExtensions): Unit = {
    ext.injectTableFunction(tvf("graft_dedup_minhash", 3) { (s, a) =>
      graft.operators.TextDedup.minhashDuplicates(
        s.table(str("graft_dedup_minhash", a, 0)),
        str("graft_dedup_minhash", a, 1), str("graft_dedup_minhash", a, 2))
    })

    ext.injectTableFunction(tvf("graft_quantile_group", 4) { (s, a) =>
      val n = "graft_quantile_group"
      val pcts = csv(str(n, a, 3)).map { p =>
        try p.toInt catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"$n: percentile list must be integers, got '$p'")
        }
      }
      graft.operators.Stats.histogramQuantiles(s.table(str(n, a, 0)),
        csv(str(n, a, 1)), str(n, a, 2), pcts)
    })

    ext.injectTableFunction(tvf("graft_topk_group", 4) { (s, a) =>
      val n = "graft_topk_group"
      val order = csv(str(n, a, 2)).map { entry =>
        entry.split("\\s+").toSeq match {
          case Seq(c, dir) if dir.equalsIgnoreCase("asc") => c -> true
          case Seq(c, dir) if dir.equalsIgnoreCase("desc") => c -> false
          case _ => throw new IllegalArgumentException(
            s"$n: order entries are '<col> asc' or '<col> desc', got '$entry'")
        }
      }
      graft.plans.GroupTopK.topK(s.table(str(n, a, 0)),
        csv(str(n, a, 1)), order, int(n, a, 3))
    })

    ext.injectTableFunction(tvf("graft_bloom_join", 4) { (s, a) =>
      val n = "graft_bloom_join"
      graft.operators.JoinPrune.bloomPrunedJoin(
        s.table(str(n, a, 0)), s.table(str(n, a, 1)),
        str(n, a, 2), str(n, a, 3))
    })

    ext.injectTableFunction(tvf("graft_domain_cap", 4) { (s, a) =>
      val n = "graft_domain_cap"
      graft.operators.Sampling.domainCap(s.table(str(n, a, 0)),
        str(n, a, 1), str(n, a, 2), int(n, a, 3))
    })
  }
}
