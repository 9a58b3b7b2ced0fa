package graft.functions

import graft.SparkSpec
import graft.operators.VectorOps
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.util.Random

/** The native vector kernels must be BIT-identical to the portable HOF
  * formulations they replaced (`aggregate(zip_with(...))` — the r1-r8
  * oracle-checked semantics), including the null contract, and must stay
  * inside whole-stage codegen (the reason they exist).
  */
class VectorExpressionsSpec extends SparkSpec {

  private def randFrame(n: Int, dim: Int, seed: Long) = {
    val rnd = new Random(seed)
    val rows = (0 until n).map { i =>
      Row(i.toLong, Seq.fill(dim)(rnd.nextGaussian()), Seq.fill(dim)(rnd.nextGaussian()))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3),
      StructType(Seq(
        StructField("id", LongType),
        StructField("a", ArrayType(DoubleType)),
        StructField("b", ArrayType(DoubleType)))))
  }

  test("vec_dot / vec_norm are bit-identical to the HOF formulations") {
    val df = randFrame(300, 64, seed = 7)
    val got = df.select(col("id"),
        VectorOps.dot(col("a"), col("b")).as("d"),
        VectorOps.norm(col("a")).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val want = df.select(col("id"),
        VectorOps.dotHof(col("a"), col("b")).as("d"),
        VectorOps.normHof(col("a")).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, (d, n)) =>
      // exact: same left-to-right double accumulation, not approx-equal
      assert(d == want(id)._1 && n == want(id)._2, s"id=$id")
    }
  }

  test("scorePairs (codegen) equals scorePairsLoop (r8 mapPartitions) bitwise") {
    val rnd = new Random(11)
    val rows = (0 until 200).map { i =>
      val va = Seq.fill(48)(rnd.nextGaussian())
      val vb = Seq.fill(48)(rnd.nextGaussian())
      val na = math.sqrt(va.map(x => x * x).sum)
      val nb = math.sqrt(vb.map(x => x * x).sum)
      Row(i.toLong, (i + 1000).toLong, va, vb, na, nb)
    }
    val schema = StructType(Seq(
      StructField("ka", LongType), StructField("kb", LongType),
      StructField("va", ArrayType(DoubleType)), StructField("vb", ArrayType(DoubleType)),
      StructField("na", DoubleType), StructField("nb", DoubleType)))
    val pairs = spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
    val fast = VectorOps.scorePairs(pairs)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    val loop = VectorOps.scorePairsLoop(pairs)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(fast == loop)
  }

  test("null contract matches zip_with/aggregate: mismatch or null element => NULL, empty => 0") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)), // length mismatch
        Row(2L, Seq(1.0, null, 3.0), Seq(1.0, 2.0, 3.0)), // null element
        Row(3L, Seq.empty[Any], Seq.empty[Any]), // empty
        Row(4L, null, Seq(1.0)) // null array
      ), 1),
      StructType(Seq(
        StructField("id", LongType),
        StructField("a", ArrayType(DoubleType)),
        StructField("b", ArrayType(DoubleType)))))
    for (d <- Seq[(org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column](
        VectorOps.dot, VectorOps.dotHof)) {
      val m = df.select(col("id"), d(col("a"), col("b")).as("x"))
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
      assert(m(1L) == null && m(2L) == null && m(3L) == 0.0 && m(4L) == null)
    }
    val n = df.select(col("id"), VectorOps.norm(col("a")).as("x"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(n(2L) == null && n(3L) == 0.0 && n(4L) == null)
  }

  test("float arrays implicit-cast like transform(cast)") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, Seq(1.5f, -2.25f, 3.0f), Seq(0.5f, 4.0f, -1.0f))), 1),
      StructType(Seq(
        StructField("id", LongType),
        StructField("a", ArrayType(FloatType)),
        StructField("b", ArrayType(FloatType)))))
    val native = df.select(VectorOps.dot(col("a"), col("b"))).head.getDouble(0)
    val hof = df.select(VectorOps.dotHof(
      transform(col("a"), _.cast("double")),
      transform(col("b"), _.cast("double")))).head.getDouble(0)
    assert(native == hof)
  }

  test("interpreted eval path (Literal.eval) agrees with codegen") {
    val a = Literal.create(Seq(1.0, 2.0, 3.0), ArrayType(DoubleType))
    val b = Literal.create(Seq(4.0, 5.0, 6.0), ArrayType(DoubleType))
    assert(DotProduct(a, b).eval(null) == 32.0)
    assert(NormL2(Literal.create(Seq(3.0, 4.0), ArrayType(DoubleType))).eval(null) == 5.0)
    assert(DotProduct(a, Literal.create(Seq(1.0), ArrayType(DoubleType))).eval(null) == null)
  }

  test("SQL functions vec_dot / vec_norm are registered via GraftExtensions") {
    val r = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, vec_norm(array(3.0d, 4.0d)) AS n")
      .head()
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 5.0)
  }

  test("SQL function simhash64 is registered and matches the operator column") {
    import org.apache.spark.sql.functions.{lit, split}
    val viaSql = spark.sql(
      "SELECT simhash64(split('alpha beta gamma', ' ')) AS sig").head().getLong(0)
    val viaCol = spark.range(1)
      .select(graft.functions.SimHash64
        .simhash64(split(lit("alpha beta gamma"), " ")).as("sig"))
      .head().getLong(0)
    assert(viaSql == viaCol && viaSql != 0L)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT simhash64(array('a'), array('b'))").collect()
    }
    assert(e.getMessage.contains("simhash64"), e.getMessage)
  }

  test("wrong arity raises a proper AnalysisException naming the function") {
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT vec_dot(array(1.0d))").collect()
    }
    assert(e1.getMessage.contains("vec_dot") && e1.getMessage.contains("2"),
      e1.getMessage)
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT vec_norm(array(1.0d), array(2.0d))").collect()
    }
    assert(e2.getMessage.contains("vec_norm"), e2.getMessage)
  }

  test("optimizer rewrites canonical HOF dot/norm shapes to the native kernels") {
    val df = randFrame(5, 8, seed = 9)
    // the CANONICAL portable shapes ((p,q) -> p*q, (acc,v) -> acc+v) — what
    // a user would write; dotHof/normHof flip the add on purpose to stay
    // un-rewritten as oracles
    val canonical = df.select(
      aggregate(zip_with(col("a"), col("b"), (p, q) => p * q),
        lit(0.0), (acc, v) => acc + v).as("d"),
      sqrt(aggregate(col("a"), lit(0.0), (acc, v) => acc + v * v)).as("n"))
    val opt = canonical.queryExecution.optimizedPlan.toString
    assert(opt.contains("vec_dot") && opt.contains("vec_norm"), opt)
    assert(!opt.contains("aggregate("), opt)
    // oracle shapes must NOT be rewritten (they guard the differentials)
    val oracle = df.select(VectorOps.dotHof(col("a"), col("b")).as("d"),
      VectorOps.normHof(col("a")).as("n"))
    val opt2 = oracle.queryExecution.optimizedPlan.toString
    assert(!opt2.contains("vec_dot") && !opt2.contains("vec_norm"), opt2)
    // and values agree bitwise either way
    val x = canonical.collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val y = oracle.collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(x.sameElements(y))
  }

  test("scorePairs stays one fused codegen stage — no encoder boundary") {
    val pairs = randFrame(10, 8, seed = 3)
      .select(col("id").as("ka"), col("id").as("kb"), col("a").as("va"),
        col("b").as("vb"), lit(1.0).as("na"), lit(1.0).as("nb"))
    val plan = VectorOps.scorePairs(pairs).queryExecution.executedPlan.toString
    // `*(n)` is the WholeStageCodegen stage marker; the kernel must sit
    // inside one (a CodegenFallback expression would break the span)
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("vec_dot")), plan)
    // the r8 loop forced SerializeFromObject/DeserializeToObject around a
    // mapPartitions; the native expression must not
    assert(!plan.contains("SerializeFromObject") && !plan.contains("MapPartitions"), plan)
  }
}
