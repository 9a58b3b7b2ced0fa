package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Byte-pair-encoding tokenizer: train on the corpus, encode at scale —
  * the real-tokenizer upgrade over the `text_tokens` regex heuristic
  * (BPE per Sennrich et al. 2016, arXiv:1508.07909; trained on a WORD
  * FREQUENCY table like sentencepiece/HF, not on raw text).
  *
  * Scale shape: the corpus contributes ONE map-side-combined word-count
  * shuffle; training itself runs on the driver over the top-`vocabCap`
  * word-frequency rows (the standard practice — merges are determined by
  * frequent words; the capped table is ~1 MB, the collect is bounded like
  * [[VectorOps.centroidBudget]]'s), and encoding broadcasts the merge
  * ranks and runs a narrow per-partition greedy loop — the corpus text
  * never shuffles.
  *
  * Determinism: pair selection breaks ties by count desc, then pair
  * lexicographic asc; the word table is ordered (count desc, word asc)
  * before the cap. Same corpus => same merges, any partitioning.
  *
  * Simplification vs the paper (documented): no end-of-word marker — a
  * merge applies anywhere in a word. Right for token COUNTING and
  * compression-ratio curation signals; a generation-grade tokenizer
  * would add the marker (one more symbol per word, same machinery).
  *
  * The merge-loop argmax is iterative, but the merge budget is a fixed
  * literal, so the external oracle replays the ENTIRE training run as a
  * chain of one-merge-per-block SQL CTEs (see TextQueries.bpeTrainCtes):
  * `text_bpe` hash-checks train+encode end-to-end and `text_bpe_merges`
  * hash-checks the artifact itself; an independent reference
  * implementation in the test suite (paper example + randomized
  * differential) locks the unit level.
  */
object Bpe {

  /** Ordered merge list; rank = application priority (lower first). */
  final case class BpeModel(merges: Seq[(String, String)]) {
    def save(path: String): Unit = {
      val spark = SparkSession.active
      import spark.implicits._
      merges.zipWithIndex.map { case ((a, b), r) => (r, a, b) }
        .toDF("rank", "left", "right").coalesce(1)
        .write.mode("overwrite").parquet(path)
    }
  }

  def loadModel(spark: SparkSession, path: String): BpeModel =
    BpeModel(spark.read.parquet(path).orderBy("rank")
      .select("left", "right").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq)

  /** A frozen pretrained merge table (50 merges, trained once via
    * [[train]] on the sf0.01 synthetic corpus and embedded as a literal —
    * the LSH-hyperplane stance). This is the production tokenizer shape
    * (load a fixed artifact, encode any corpus with it), and because the
    * merges are a literal rather than retrained per run, an external SQL
    * oracle can replay the greedy encode exactly (`text_bpe_encode`).
    */
  val pretrained: Seq[(String, String)] = Seq(
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("j", "o"), ("jo", "in"), ("a", "s"), ("as", "h"), ("h", "ash"),
    ("r", "ow"), ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
    ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("cu", "st"), ("cust", "o"),
    ("custo", "mer"), ("f", "i"), ("fi", "l"), ("fil", "t"),
    ("filt", "er"), ("a", "l"), ("al", "l"), ("m", "all"), ("s", "mall"),
    ("g", "e"), ("l", "ow"), ("mer", "ge"), ("s", "low"), ("c", "t"),
    ("ct", "or"), ("d", "er"), ("e", "ctor"), ("or", "der"),
    ("v", "ector"), ("in", "e"), ("l", "ine"))

  /** The (word, count) frequency table — one map-side-combined shuffle. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    Spread(docs.select(split(lower(col(textCol)), "\\s+").as("_ws")))
      .select(explode(col("_ws")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("c"))

  /** Train `numMerges` merges on the top-`vocabCap` words by frequency. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            vocabCap: Int = 65536): BpeModel = {
    val top = wordCounts(docs, textCol)
      .orderBy(col("c").desc, col("word").asc)
      .limit(vocabCap)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    trainOnCounts(top, numMerges)
  }

  /** Driver-side merge loop over the word-frequency dict (HF shape). */
  private[operators] def trainOnCounts(wordCounts: Seq[(String, Long)],
                                       numMerges: Int): BpeModel = {
    var words: Array[(Array[String], Long)] =
      wordCounts.map { case (w, c) => (w.map(_.toString).toArray, c) }.toArray
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var k = 0
    while (k < numMerges) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      if (pairCounts.isEmpty) k = numMerges
      else {
        val best = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val merged = best._1 + best._2
        words = words.map { case (syms, c) =>
          if (syms.length < 2) (syms, c)
          else {
            val out = mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
                out += merged; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.toArray, c)
          }
        }
        k += 1
      }
    }
    BpeModel(merges.toSeq)
  }

  /** Greedy encode of one word: repeatedly apply the LOWEST-rank adjacent
    * merge (leftmost on rank ties — HF semantics) until none applies.
    */
  private[operators] def encodeWord(word: String,
                                    rank: collection.Map[(String, String), Int]): Array[String] = {
    var syms = word.map(_.toString).toArray
    var done = false
    while (!done && syms.length >= 2) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < syms.length - 1) {
        rank.get((syms(i), syms(i + 1))) match {
          case Some(r) if r < bestRank => bestRank = r; bestIdx = i
          case _                       =>
        }
        i += 1
      }
      if (bestIdx < 0) done = true
      else {
        val out = new Array[String](syms.length - 1)
        var j = 0
        while (j < bestIdx) { out(j) = syms(j); j += 1 }
        out(bestIdx) = syms(bestIdx) + syms(bestIdx + 1)
        j = bestIdx + 1
        while (j < out.length) { out(j) = syms(j + 1); j += 1 }
        syms = out
      }
    }
    syms
  }

  /** Per-document BPE statistics: token count and an order-sensitive
    * digest of the token stream (xxhash64-chained), via one narrow
    * per-partition pass over a broadcast rank map. Wordless docs keep a
    * row (0 tokens, digest of the empty stream).
    */
  def tokenStats(docs: DataFrame, idCol: String, textCol: String,
                 model: BpeModel): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val rankSeq = model.merges.zipWithIndex
    val bc = docs.sparkSession.sparkContext.broadcast(rankSeq)
    val in = docs.select(col(idCol).as("doc_id"),
      split(lower(col(textCol)), "\\s+").as("_ws"))
    val outSchema = StructType(Seq(
      in.schema.fields.head.copy(name = "doc_id"),
      StructField("n_words", LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("token_digest", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    in.mapPartitions { rows =>
      val rank: Map[(String, String), Int] = bc.value.toMap
      // per-word memo: corpus words repeat heavily, encode each once.
      // Hard-capped: a web-scale partition's distinct-word tail would
      // otherwise grow the map without bound — past the cap, rare words
      // just re-encode (they were amortizing nothing anyway)
      val memoCap = 1 << 20
      val memo = mutable.HashMap.empty[String, Array[String]]
      rows.map { r =>
        // null text ⇒ split(lower(null)) is a null array; such docs get
        // the same 0-token row as wordless ones (train tolerates them
        // too — explode drops null arrays), not an NPE at encode time
        val ws = Option(r.getSeq[String](1)).getOrElse(Nil).filter(_.nonEmpty)
        var nTok = 0L
        var digest = 42L
        ws.foreach { w =>
          val toks = memo.getOrElse(w, {
            val t = encodeWord(w, rank)
            if (memo.size < memoCap) memo(w) = t
            t
          })
          nTok += toks.length
          toks.foreach { t =>
            val u = org.apache.spark.unsafe.types.UTF8String.fromString(t)
            digest = XXH64.hashLong(XXH64.hashUnsafeBytes(
              u.getBaseObject, u.getBaseOffset, u.numBytes(), 42L), digest)
          }
        }
        Row(r.get(0), ws.length.toLong, nTok, digest)
      }
    }(enc)
  }

  /** Portable-digest variant of [[tokenStats]] for cross-engine
    * verification: `token_digest` is the md5 hex of the space-joined token
    * stream (DuckDB has `md5`; the [[tokenStats]] XXH64 chain is
    * Spark-internal). Same narrow broadcast-rank encode pass; the joined
    * string is O(doc length) — the same order as the text column itself —
    * and never shuffles (md5 collapses it in the same stage).
    */
  def tokenStatsPortable(docs: DataFrame, idCol: String, textCol: String,
                         model: BpeModel): DataFrame = {
    val bc = docs.sparkSession.sparkContext.broadcast(model.merges.zipWithIndex)
    val in = docs.select(col(idCol).as("doc_id"),
      split(lower(col(textCol)), "\\s+").as("_ws"))
    val outSchema = StructType(Seq(
      in.schema.fields.head.copy(name = "doc_id"),
      StructField("n_words", LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("_toks", StringType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    in.mapPartitions { rows =>
      val rank: Map[(String, String), Int] = bc.value.toMap
      val memoCap = 1 << 20
      val memo = mutable.HashMap.empty[String, Array[String]]
      rows.map { r =>
        val ws = Option(r.getSeq[String](1)).getOrElse(Nil).filter(_.nonEmpty)
        var nTok = 0L
        val sb = new StringBuilder
        ws.foreach { w =>
          val toks = memo.getOrElse(w, {
            val t = encodeWord(w, rank)
            if (memo.size < memoCap) memo(w) = t
            t
          })
          nTok += toks.length
          toks.foreach { t =>
            if (sb.nonEmpty) sb.append(' ')
            sb.append(t)
          }
        }
        Row(r.get(0), ws.length.toLong, nTok, sb.toString)
      }
    }(enc).select(col("doc_id"), col("n_words"), col("n_tokens"),
      md5(col("_toks")).as("token_digest"))
  }
}
