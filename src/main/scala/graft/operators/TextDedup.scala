package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection over document corpora — the load-bearing
  * operators of a training-data pipeline. Everything is built from codegen'd
  * Catalyst expressions (no UDFs): shingling and MinHash signatures are
  * higher-order array functions over `xxhash64`, LSH banding is an explode +
  * hash, and candidate verification runs only within buckets.
  *
  * 100 TB design notes:
  *  - the only shuffles are (a) explode+groupBy on band keys and (b) the
  *    in-bucket self-join; both carry (doc_id, band_key) pairs, never text;
  *  - shingle sets are re-joined only for candidate pairs (<< all pairs);
  *  - band count / rows-per-band trade recall for bucket skew: with r rows
  *    per band and b bands, P(candidate | jaccard s) = 1 - (1 - s^r)^b.
  *    Defaults (r=2, b=64) give recall > 0.9999 at s = 0.5;
  *  - a hot bucket (e.g. boilerplate shingles) is bounded by salting the
  *    band key with `doc_id % salt` on the build side if skew shows up.
  */
object TextDedup {

  /** Distinct word k-shingles of a text column. */
  def wordShingles(text: Column, k: Int): Column = {
    val words = split(text, "\\s+")
    array_distinct(
      transform(sequence(lit(0), greatest(size(words) - k, lit(0))),
        i => concat_ws(" ", slice(words, i + lit(1), lit(k)))))
  }

  /** MinHash signature over pre-hashed shingles (`array<long>`): the i-th
    * permutation is `xxhash64(shingleHash, i)`. Each shingle string is
    * hashed exactly once upstream; re-hashing fixed-width longs per
    * permutation is cheap (and stays inside ANSI arithmetic — the classic
    * affine family needs wrapping multiplication, which ANSI mode rejects).
    */
  def minhashSignature(shingleHashes: Column, numHashes: Int): Column =
    array((1 to numHashes).map { i =>
      array_min(transform(shingleHashes, h => xxhash64(h, lit(i))))
    }: _*)

  /** LSH band keys straight from the hashed shingle set: band `b` hashes
    * its own `numHashes / bands` minhash coordinates.
    *
    * Built per-band rather than as a slice of one signature array: slicing
    * a composed 128-element signature expression would inline the whole
    * signature into every band (bands x numHashes higher-order nodes), which
    * blows up Catalyst's optimizer and codegen — planning time was 80x the
    * execution time before this restructuring.
    */
  def bandKeys(shingleHashes: Column, numHashes: Int, bands: Int): Column = {
    val r = numHashes / bands
    array((0 until bands).map { b =>
      val coords = (b * r until (b + 1) * r).map { i =>
        array_min(transform(shingleHashes, h => xxhash64(h, lit(i + 1))))
      }
      struct(lit(b).as("band"), xxhash64(coords: _*).as("bucket"))
    }: _*)
  }

  /** Candidate pairs (idA < idB) that share at least one LSH bucket,
    * verified with their exact jaccard similarity over the shingle sets.
    * Output: (id_a, id_b, jaccard), jaccard >= `threshold`.
    */
  def minhashDuplicates(
    df: DataFrame,
    idCol: String,
    textCol: String,
    shingleK: Int = 3,
    numHashes: Int = 128,
    bands: Int = 64,
    threshold: Double = 0.5
  ): DataFrame = {
    // one string hash per distinct shingle; signature + verification both
    // work on the hashed set. Cached because the self-join and the verify
    // join would otherwise recompute the whole shingling lineage per use
    // (at production scale this frame is a materialized signature table).
    val sh = df.select(col(idCol).as("id"),
        array_distinct(transform(wordShingles(col(textCol), shingleK),
          s => xxhash64(s))).as("hs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = sh
      .select(col("id"),
        explode(bandKeys(col("hs"), numHashes, bands)).as("bk"))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.bk") === col("y.bk") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    cand
      .join(sh.select(col("id").as("id_a"), col("hs").as("hs_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("hs").as("hs_b")), "id_b")
      .withColumn("jaccard",
        round(size(array_intersect(col("hs_a"), col("hs_b"))).cast("double") /
          size(array_union(col("hs_a"), col("hs_b"))), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 64-bit SimHash over the word multiset: bit j of the signature is the
    * sign of the sum of +-1 votes from each word's hash bit j.
    */
  def simhash64(text: Column): Column = {
    val words = split(text, "\\s+")
    val hashes = transform(words, w => xxhash64(w))
    (0 until 64).map { j =>
      val votes = aggregate(hashes, lit(0L),
        (a, h) => a + when(shiftright(h, j).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(votes > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** SimHash near-duplicates: candidates share one of four 16-bit chunks
    * (any pair within hamming distance 3 of a 64-bit signature must agree on
    * at least one chunk), verified by exact hamming distance <= `maxHamming`.
    */
  def simhashDuplicates(
    df: DataFrame,
    idCol: String,
    textCol: String,
    maxHamming: Int = 3
  ): DataFrame = {
    val sig = df.select(col(idCol).as("id"), simhash64(col(textCol)).as("sig"))
    val chunked = sig.select(col("id"), col("sig"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("chunk"),
          shiftright(col("sig"), c * 16).bitwiseAND(0xFFFFL).as("v"))): _*))
        .as("ck"))
    chunked.as("x").join(chunked.as("y"),
        col("x.ck") === col("y.ck") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        col("x.sig").as("sig_a"), col("y.sig").as("sig_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
