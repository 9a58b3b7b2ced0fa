package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** [[TextAnalysis.chunkDocuments]]: cover-exactly-once contract. */
class ChunkSpec extends SparkSpec {
  import spark.implicits._

  private def brute(words: Seq[String], chunk: Int, overlap: Int): Seq[(Long, Long, String)] = {
    val stride = chunk - overlap
    if (words.isEmpty) Nil
    else {
      val nChunks = 1 + math.max(0L,
        (words.size - chunk + stride - 1).toLong / stride).toInt
      (0 until nChunks).map { ci =>
        val slice = words.slice(ci * stride, ci * stride + chunk)
        (ci.toLong, slice.size.toLong, slice.mkString(" "))
      }
    }
  }

  test("chunks match a brute-force slicer on random docs, several configs") {
    val rng = new Random(5)
    val docs = Seq.tabulate(200) { i =>
      val n = rng.nextInt(300) // includes 0-word docs
      (i.toLong, Seq.fill(n)(s"w${rng.nextInt(50)}").mkString("  ")) // messy ws
    }
    val df = docs.toDF("doc_id", "text").repartition(4)
    for ((chunk, overlap) <- Seq((64, 16), (10, 0), (7, 6), (1, 0))) {
      val got = TextAnalysis.chunkDocuments(df, "doc_id", "text", chunk, overlap)
        .select(col("doc_id"), col("chunk_idx"), col("n_words"), col("chunk_digest"))
        .as[(Long, Long, Long, String)].collect().toSeq.sorted
      val want = docs.flatMap { case (id, text) =>
        brute(text.split("\\s+").filter(_.nonEmpty).toSeq, chunk, overlap)
          .map { case (ci, nw, t) =>
            (id, ci, nw, java.security.MessageDigest.getInstance("MD5")
              .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString)
          }
      }.sorted
      assert(got == want, s"chunk=$chunk overlap=$overlap")
    }
  }

  test("every word is covered; consecutive chunks overlap by exactly `overlap`") {
    val words = (1 to 157).map(i => s"t$i")
    val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val chunks = brute(words, 20, 5)
    // reconstruct: drop the first `overlap` words of every chunk after the
    // first, concatenate, compare to the original
    val rebuilt = chunks.head._3.split(" ").toSeq ++
      chunks.tail.flatMap(_._3.split(" ").drop(5))
    assert(rebuilt == words)
    val n = TextAnalysis.chunkDocuments(df, "doc_id", "text", 20, 5).count()
    assert(n == chunks.size)
  }

  test("zero-word and null docs emit nothing; plan has no exchange") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "one two"), (4L, null))
      .toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocuments(df, "doc_id", "text", 64, 16)
    assert(out.count() == 1)
    val p = out.queryExecution.executedPlan.toString()
    assert(!p.contains("Exchange"), p)
  }
}
