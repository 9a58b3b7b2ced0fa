package graft

import graft.operators.VectorOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Microbench for the native vector kernels (dev tool, like FlapBench):
  * isolates per-pair cosine cost from the bucket-join machinery the catalog
  * queries are bound by at sf0.1. Three formulations of the same
  * (dot / na·nb) over synthetic pairs:
  *
  *   hof    — aggregate(zip_with(...)): CodegenFallback, interpreted lambda
  *            per element + a materialized intermediate array per pair
  *   loop   — the r8 mapPartitions row loop: encoder boundary, Seq[Double]
  *            boxing per element
  *   native — graft.functions.DotProduct: fused whole-stage codegen
  *
  * Usage: sbt "runMain graft.KernelBench [nPairs] [dim]"; prints one line
  * per formulation per round (round 2 = steady state), plus a checksum so
  * none of the work can be pruned — all three must agree bitwise.
  */
object KernelBench {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("span")) return spanMain(args.drop(1))
    if (args.headOption.contains("simhash")) return simhashMain(args.drop(1))
    if (args.headOption.contains("html")) return htmlMain(args.drop(1))
    if (args.headOption.contains("gopher")) return gopherMain(args.drop(1))
    val nPairs = args.headOption.map(_.toInt).getOrElse(2000000)
    val dim = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // deterministic synthetic pairs, materialized once so every
    // formulation reads identical cached input
    val pairs = spark.range(0, nPairs, 1, cpus.toInt * 2)
      .select(col("id").as("ka"), (col("id") + 1).as("kb"),
        transform(sequence(lit(1), lit(dim)),
          i => sin(i * (col("id") + 1)).cast("double")).as("va"),
        transform(sequence(lit(1), lit(dim)),
          i => cos(i * (col("id") + 2)).cast("double")).as("vb"),
        lit(1.0).as("na"), lit(1.0).as("nb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairs.count()

    def checksum(df: DataFrame): Long =
      df.agg(bit_xor(xxhash64(round(col("sim"), 9)))).head().getLong(0)

    val forms: Seq[(String, DataFrame => DataFrame)] = Seq(
      "hof" -> { p =>
        p.select(col("ka"), col("kb"),
          (VectorOps.dotHof(col("va"), col("vb")) /
            (col("na") * col("nb"))).as("sim"))
      },
      "loop" -> { p => VectorOps.scorePairsLoop(p) },
      "native" -> { p => VectorOps.scorePairs(p) })

    val sums = scala.collection.mutable.Map.empty[String, Long]
    (1 to 2).foreach { round =>
      forms.foreach { case (name, f) =>
        val t0 = System.nanoTime()
        val s = checksum(f(pairs))
        val secs = (System.nanoTime() - t0) / 1e9
        sums(name) = s
        println(f"[kernel] $name%6s round=$round pairs=$nPairs dim=$dim " +
          f"sec=$secs%.2f mpairs_per_s=${nPairs / secs / 1e6}%.1f checksum=$s")
      }
    }
    require(sums.values.toSet.size == 1, s"formulations disagree: $sums")
    spark.stop()
  }

  /** Span-corruption kernel: the HOF fold (five interpreted steps per
    * token) vs the native one-call-per-row expression. Usage:
    * `sbt "runMain graft.KernelBench span [nDocs] [wordsPerDoc]"`.
    */
  private def spanMain(args: Seq[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(200000)
    val wpd = args.drop(1).headOption.map(_.toInt).getOrElse(80)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.range(0, nDocs, 1, cpus.toInt * 2)
      .select(col("id").as("doc_id"),
        array_join(transform(sequence(lit(1), lit(wpd)),
          i => concat(lit("tok"), pmod(i * (col("id") + 3), lit(500)))),
          " ").as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count()
    def checksum(df: DataFrame): Long =
      df.agg(bit_xor(xxhash64(col("n_masked"), col("n_spans"),
        col("input_text"), col("target_text")))).head().getLong(0)
    val forms: Seq[(String, () => DataFrame)] = Seq(
      "hof" -> (() => graft.operators.Sampling
        .spanCorruptTextHof(docs, "doc_id", "text", 15)),
      "native" -> (() => graft.operators.Sampling
        .spanCorruptText(docs, "doc_id", "text", 15)))
    val sums = scala.collection.mutable.Map.empty[String, Long]
    (1 to 2).foreach { round =>
      forms.foreach { case (name, f) =>
        val t0 = System.nanoTime()
        val s = checksum(f())
        val secs = (System.nanoTime() - t0) / 1e9
        sums(name) = s
        println(f"[kernel] span-$name%6s round=$round docs=$nDocs wpd=$wpd " +
          f"sec=$secs%.2f kdocs_per_s=${nDocs / secs / 1e3}%.1f checksum=$s")
      }
    }
    require(sums.values.toSet.size == 1, s"formulations disagree: $sums")
    spark.stop()
  }

  /** Gopher quality-statistics kernel A/B: the interpreted-HOF stack
    * (aggregate folds, filter lambdas, array_sort + run fold, per-element
    * bigram transform) vs the native one-call-per-row expression. Synthetic
    * documents exercise every rule: 7-word lines, duplicated lines on every
    * 6th doc, bullets on every 3rd, ellipses on every 4th, a looping bigram
    * tail on every 5th, numeric words on every 7th.
    * `sbt "runMain graft.KernelBench gopher [nDocs] [wordsPerDoc]"`.
    */
  private def gopherMain(args: Seq[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(100000)
    val wpd = args.drop(1).headOption.map(_.toInt).getOrElse(120)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val id = col("doc_id")
    val flat = array_join(transform(sequence(lit(1), lit(wpd)),
      i => when(pmod(col("doc_id"), lit(7)) === 0, pmod(i * (id + 3), lit(500)).cast("string"))
        .otherwise(concat(lit("tok"), pmod(i * (id + 3), lit(500))))), " ")
    val l0 = regexp_replace(flat, "((?:\\S+ ){6}\\S+) ", "$1\n")
    val l1 = when(id % 6 === 0, concat(l0, lit("\n"), l0)).otherwise(l0)
    val l2 = when(id % 3 === 0,
      concat(lit("- "), regexp_replace(l1, "\n", "\n- "))).otherwise(l1)
    val l3 = when(id % 4 === 0,
      concat(regexp_replace(l2, "\n", "...\n"), lit("..."))).otherwise(l2)
    val lined = when(id % 5 === 0,
      concat(l3, lit(" same pair" * 30))).otherwise(l3)
    val docs = spark.range(0, nDocs, 1, cpus.toInt * 2)
      .select(col("id").as("doc_id")).select(id, lined.as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count()
    def checksum(df: DataFrame): Long =
      df.agg(bit_xor(xxhash64(Bench.checksumCols(df): _*))).head().getLong(0)
    val forms: Seq[(String, () => DataFrame)] = Seq(
      "hof" -> (() => graft.operators.TextAnalysis
        .gopherFrameHof(docs, "doc_id", "text")),
      "native" -> (() => graft.operators.TextAnalysis
        .gopherFrame(docs, "doc_id", "text")))
    val sums = scala.collection.mutable.Map.empty[String, Long]
    (1 to 2).foreach { round =>
      forms.foreach { case (name, f) =>
        val t0 = System.nanoTime()
        val s = checksum(f())
        val secs = (System.nanoTime() - t0) / 1e9
        sums(name) = s
        println(f"[kernel] gopher-$name%6s round=$round docs=$nDocs wpd=$wpd " +
          f"sec=$secs%.2f kdocs_per_s=${nDocs / secs / 1e3}%.1f checksum=$s")
      }
    }
    require(sums.values.toSet.size == 1, s"formulations disagree: $sums")
    spark.stop()
  }

  /** HTML extraction kernel A/B: the seven-pass regex chain (each pass a
    * full scan + rebuild of the document string) vs the native single-pass
    * scanner. Synthetic documents carry every construct (comment, head
    * with title+style, anchors, entities, script).
    * `sbt "runMain graft.KernelBench html [nDocs] [paras]"`.
    */
  private def htmlMain(args: Seq[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(100000)
    val paras = args.drop(1).headOption.map(_.toInt).getOrElse(12)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val para = concat(lit("<p class='c'>tok"), pmod(col("id"), lit(97)),
      lit(" &amp; <a href=\"/l"), pmod(col("id"), lit(13)),
      lit("\">link</a> body text here</p>"))
    val docs = spark.range(0, nDocs, 1, cpus.toInt * 2)
      .select(col("id").as("doc_id"), concat(
        lit("<html><!-- c --><head><title>T"), col("id"),
        lit("</title><style>p{x:1}</style></head><body>"),
        array_join(transform(sequence(lit(1), lit(paras)), _ => para), " "),
        lit("<script>var z = 1 < 2;</script></body></html>")).as("html"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count()
    def checksum(df: DataFrame): Long =
      df.agg(bit_xor(xxhash64(col("e.title"), col("e.text"),
        col("e.n_links")))).head().getLong(0)
    val forms: Seq[(String, () => DataFrame)] = Seq(
      "chain" -> (() => docs.select(graft.operators.TextAnalysis
        .htmlExtractRelational(col("html")).as("e"))),
      "native" -> (() => docs.select(graft.functions.HtmlExtract
        .htmlExtract(col("html")).as("e"))))
    val sums = scala.collection.mutable.Map.empty[String, Long]
    (1 to 2).foreach { round =>
      forms.foreach { case (name, f) =>
        val t0 = System.nanoTime()
        val s = checksum(f())
        val secs = (System.nanoTime() - t0) / 1e9
        sums(name) = s
        println(f"[kernel] html-$name%6s round=$round docs=$nDocs paras=$paras " +
          f"sec=$secs%.2f kdocs_per_s=${nDocs / secs / 1e3}%.1f checksum=$s")
      }
    }
    require(sums.values.toSet.size == 1, s"formulations disagree: $sums")
    spark.stop()
  }

  /** SimHash signature kernel A/B: the relational frame (explode +
    * 64-column partial agg + id shuffle) vs the whole-doc native kernel
    * (pure narrow map). `sbt "runMain graft.KernelBench simhash [nDocs]
    * [wordsPerDoc]"`.
    */
  private def simhashMain(args: Seq[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(200000)
    val wpd = args.drop(1).headOption.map(_.toInt).getOrElse(80)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.range(0, nDocs, 1, cpus.toInt * 2)
      .select(col("id").as("doc_id"),
        array_join(transform(sequence(lit(1), lit(wpd)),
          i => concat(lit("tok"), pmod(i * (col("id") + 3), lit(500)))),
          " ").as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count()
    def checksum(df: DataFrame): Long =
      df.agg(bit_xor(xxhash64(col("id"), col("sig")))).head().getLong(0)
    val forms: Seq[(String, () => DataFrame)] = Seq(
      "frame" -> (() => graft.operators.TextDedup
        .simhashSignatures(docs, "doc_id", "text")),
      "native" -> (() => graft.operators.TextDedup
        .simhashSignaturesNative(docs, "doc_id", "text")))
    val sums = scala.collection.mutable.Map.empty[String, Long]
    (1 to 2).foreach { round =>
      forms.foreach { case (name, f) =>
        val t0 = System.nanoTime()
        val s = checksum(f())
        val secs = (System.nanoTime() - t0) / 1e9
        sums(name) = s
        println(f"[kernel] simhash-$name%6s round=$round docs=$nDocs wpd=$wpd " +
          f"sec=$secs%.2f kdocs_per_s=${nDocs / secs / 1e3}%.1f checksum=$s")
      }
    }
    require(sums.values.toSet.size == 1, s"formulations disagree: $sums")
    spark.stop()
  }
}
