package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Quality gates for the training-data-pipeline operators that hash-based
  * oracles cannot check directly: LSH recall vs brute force, SimHash
  * behavior, and the batched media path vs its columnar oracle.
  */
class LlmOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("ann_lsh recall >= 0.9 against brute-force top-5") {
    val e = Tables.embeddings(spark, sf).cache()
    val q = e.filter(col("vec_id") % 50 === 0)
    val exact = VectorOps.bruteForceTopK(q, "vec_id", "embedding", e, "vec_id", "embedding", 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = VectorOps.lshTopK(q, "vec_id", "embedding", e, "vec_id", "embedding", 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall < 0.9 (|exact|=${exact.size}, hit=${(exact intersect approx).size})")
  }

  test("bucketRows matches the Column-level lshBuckets oracle") {
    import spark.implicits._
    val planes = VectorOps.hyperplanes(tables = 8, bits = 4, dim = 64)
    val base = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val fast = VectorOps.bucketRows(base, "id", "v", planes)
      .select(col("id"), col("bk.table"), col("bk.bucket"))
      .as[(Long, Int, Long)].collect().toSet
    val oracle = base
      .select(col("id"), explode(VectorOps.lshBuckets(col("v"), planes)).as("bk"))
      .select(col("id"), col("bk.table"), col("bk.bucket"))
      .as[(Long, Int, Long)].collect().toSet
    assert(fast == oracle,
      s"mismatch: only-fast=${(fast -- oracle).take(3)}, only-oracle=${(oracle -- fast).take(3)}")
  }

  test("minhash candidate recall is total on the planted near-dups") {
    import spark.implicits._
    // brute-force 3-gram jaccard >= 0.5 pairs
    val docs = Tables.documents(spark, sf).cache()
    val sh = docs.select(col("doc_id"),
      TextDedup.wordShingles(col("text"), 3).as("sh"))
    val truth = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("j", size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
        size(array_union(col("a.sh"), col("b.sh"))))
      .filter(col("j") >= 0.5)
      .select(col("a.doc_id"), col("b.doc_id"))
      .as[(Long, Long)].collect().toSet
    val found = TextDedup.minhashDuplicates(docs, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty, "fixture should contain planted near-duplicates")
    assert(truth == found, s"minhash missed ${truth -- found}, extra ${found -- truth}")
  }

  test("ngram jaccard prefix filtering finds exactly the brute-force pairs") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).cache()
    val sh = docs.select(col("doc_id"),
      TextDedup.wordShingles(col("text"), 4).as("sh"))
    val truth = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("j", size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
        size(array_union(col("a.sh"), col("b.sh"))))
      .filter(col("j") >= 0.5)
      .select(col("a.doc_id"), col("b.doc_id"))
      .as[(Long, Long)].collect().toSet
    val found = TextDedup.ngramJaccardDuplicates(docs, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty, "fixture should contain planted near-duplicates")
    assert(truth == found, s"prefix filter missed ${truth -- found}, extra ${found -- truth}")
  }

  test("ann_ivf recall against brute-force top-5") {
    val e = Tables.embeddings(spark, sf).cache()
    val q = e.filter(col("vec_id") % 50 === 0)
    val exact = VectorOps.bruteForceTopK(q, "vec_id", "embedding", e, "vec_id", "embedding", 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = VectorOps.ivfTopK(q, "vec_id", "embedding", e, "vec_id", "embedding",
        k = 5, minStride = 25, nprobe = 4)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // nprobe=4 of ~20 lists scans ~20% of the corpus; measured recall 0.96
    // even in this loose-cluster regime (max pairwise cosine ~0.5)
    assert(recall >= 0.85, s"IVF recall $recall < 0.85 (|exact|=${exact.size})")
  }

  test("minhashBandRows equals the flat-aggregate xxhash64 oracle") {
    val docs = Tables.documents(spark, sf)
    val sh = docs.select(col("doc_id").as("id"),
        array_distinct(transform(TextDedup.wordShingles(col("text"), 3),
          s => xxhash64(s))).as("hs"))
      .cache()
    val fused = TextDedup.minhashBandRows(sh, 128, 64)
      .select(col("id"), col("bk.band"), col("bk.bucket"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val agg = TextDedup.minhashBandRowsAgg(sh, 128, 64)
      .select(col("id"), col("bk.band"), col("bk.bucket"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(fused.nonEmpty && fused == agg,
      s"fused-only=${(fused -- agg).take(3)} agg-only=${(agg -- fused).take(3)}")
  }

  test("ivfStride keeps the centroid count sqrt-N-ish and hard-capped") {
    // floor regime: tiny corpora keep the minimum stride
    assert(VectorOps.ivfStride(500) == 25L)
    // sqrt regime: stride ~ sqrt(N) => N/stride centroids ~ sqrt(N)
    assert(VectorOps.ivfStride(2000) == 45L)
    assert(VectorOps.ivfStride(1000000000L) == 31623L)
    // cap regime: centroid count never exceeds maxCentroids
    for (n <- Seq(1000L, 1000000L, 1000000000L, 1000000000000L)) {
      val s = VectorOps.ivfStride(n)
      assert(n / s <= (1 << 16).toLong, s"n=$n stride=$s centroids=${n / s}")
    }
    // empty-centroid fallback: ids 1..24 have no multiple of stride 25 —
    // ivfTopK must degrade to brute force, not return an empty frame
    import spark.implicits._
    val tiny = (1 to 24).map(i => (i.toLong, Array.fill(8)(i / 24.0f))).toDF("vec_id", "embedding")
    val out = VectorOps.ivfTopK(tiny.filter(col("vec_id") === 1), "vec_id", "embedding",
      tiny, "vec_id", "embedding", k = 3)
    assert(out.count() == 3L)
  }

  test("centroid collects are byte-bounded, not just row-bounded") {
    // the row cap alone lets dim scale the collect unboundedly: 65536 rows
    // are ~35 MB at dim 64 but ~500 MB at dim 1024. The byte budget caps
    // rows by dim; at the catalog's dim 64 the default 64 MB budget leaves
    // the row cap untouched (hash-stability of the oracle queries).
    assert(VectorOps.centroidBudget(64) == (1 << 16))
    val at1024 = VectorOps.centroidBudget(1024)
    assert(at1024 < (1 << 16) && at1024.toLong * (8L * 1024 + 64) <= (64L << 20),
      s"dim-1024 budget $at1024 must fit 64 MB")
    // floor: a tiny budget still quantizes instead of degenerating
    assert(VectorOps.centroidBudget(4096, maxBytes = 1024) == 256)
    // the reduced cap flows through ivfStride: fewer cells => larger stride
    val n = 1000000000L
    val strideDefault = VectorOps.ivfStride(n, 25, VectorOps.centroidBudget(64))
    val strideHighDim = VectorOps.ivfStride(n, 25, VectorOps.centroidBudget(1024))
    assert(strideHighDim > strideDefault,
      s"dim-1024 stride $strideHighDim must exceed dim-64 stride $strideDefault")
    // kmeans clamps k to the byte budget (init collect + per-iteration
    // means collect are both k rows of dim doubles)
    import spark.implicits._
    val df = (1 to 600).map(i =>
      (i.toLong, Array.tabulate(8)(d => ((i * 31 + d) % 17 - 8) / 8.0f)))
      .toDF("vec_id", "embedding")
    val clamped = VectorOps.kmeansCentroids(df, "vec_id", "embedding",
      k = 500, iters = 1, maxCentroidBytes = 1024)
    assert(clamped.length <= 256, s"expected <= 256 centroids, got ${clamped.length}")
    assert(clamped.nonEmpty)
  }

  test("bigramLmScores matches a JVM bigram model and ranks gibberish lowest") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the mat again"),
      (3L, "zq xv qj zz pk wq"),     // transitions unseen elsewhere
      (4L, "the"),                   // single word: 0 bigrams, NULL score
      (5L, "the cat sat"))
    val got = TextAnalysis.bigramLmScores(docs.toDF("doc_id", "text"),
      "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    // JVM replay of the integer-quantized Laplace model
    val bigrams = docs.flatMap { case (id, t) =>
      t.split("\\s+").toSeq.sliding(2).filter(_.size == 2)
        .map(p => (id, (p(0), p(1)))).toSeq
    }
    val c2 = bigrams.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val c1 = c2.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    val v = c1.size.toLong
    val expected = bigrams.groupBy(_._1).map { case (id, bs) =>
      val ppms = bs.map { case (_, b) => (c2(b) + 1) * 1000000L / (c1(b._1) + v) }
      id -> (bs.size.toLong, ppms.sum, ppms.sum / bs.size)
    }
    expected.foreach { case (id, e) =>
      assert(got(id) == e, s"doc $id: expected $e, got ${got(id)}")
    }
    assert(got(4L)._1 == 0L && got(4L)._3 == -1L,
      "single-word doc keeps a row with NULL score")
    // the whole point of the smoothing: unique-word gibberish (whose raw
    // conditionals would all be 1) must rank LOWEST, common text highest
    assert(got(3L)._3 < got(1L)._3 && got(3L)._3 < got(2L)._3 &&
      got(3L)._3 < got(5L)._3,
      s"gibberish must rank lowest: $got")
  }

  test("external bigram model: OOV Laplace, self-equivalence, save/load round-trip") {
    import spark.implicits._
    val ref = Seq(
      (101L, "the cat sat on the mat"),
      (102L, "the dog sat on the rug")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "the cat sat"),            // fully in-vocabulary
      (2L, "the cat flew"),           // unseen pair, known prefix
      (3L, "purple elephants sing")   // unknown everything
    ).toDF("doc_id", "text")
    val model = TextAnalysis.bigramModel(ref, "doc_id", "text")
    val got = TextAnalysis.bigramLmScoresWith(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // JVM Laplace replay: V = distinct prefixes of the REF corpus
    val refBi = ref.as[(Long, String)].collect().flatMap(_._2.split(" ").sliding(2))
      .map(p => (p(0), p(1)))
    val c2 = refBi.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c1 = c2.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
    val v = c1.size.toLong
    def ppm(a: String, b: String): Long =
      (c2.getOrElse((a, b), 0L) + 1) * 1000000L / (c1.getOrElse(a, 0L) + v)
    assert(got(1L) == ((2L, ppm("the", "cat") + ppm("cat", "sat"))))
    assert(got(2L) == ((2L, ppm("the", "cat") + ppm("cat", "flew"))))
    assert(got(3L) == ((2L, 2L * (1000000L / v))), s"OOV doc: ${got(3L)}")
    // gibberish unknown to the model ranks below in-vocabulary text
    assert(got(3L)._2 < got(1L)._2)
    // scoring a corpus against its own trained model == the self-scorer
    val self = TextAnalysis.bigramLmScores(ref, "doc_id", "text")
      .collect().map(_.toSeq).toSet
    val viaModel = TextAnalysis.bigramLmScoresWith(ref, "doc_id", "text", model)
      .collect().map(_.toSeq).toSet
    assert(self == viaModel)
    // the artifact round-trips through parquet
    val dir = java.nio.file.Files.createTempDirectory("graft-lm").toString
    model.save(dir)
    val reloaded = TextAnalysis.loadBigramModel(spark, dir)
    assert(reloaded.vocab == model.vocab)
    val viaReload = TextAnalysis.bigramLmScoresWith(docs, "doc_id", "text", reloaded)
      .collect().map(_.toSeq).toSet
    assert(viaReload == TextAnalysis.bigramLmScoresWith(docs, "doc_id", "text", model)
      .collect().map(_.toSeq).toSet)
  }

  test("gopher quality rules fire on planted rule-violating documents") {
    import spark.implicits._
    val clean = (1 to 60).map(i => s"word$i").mkString(" ")          // passes all
    val dupLines = "aa bb cc\naa bb cc\naa bb cc\n" + clean          // dup lines > 0.3
    val bullets = (1 to 12).map(i => s"- item$i number").mkString("\n") +
      "\n" + clean.split(" ").take(8).mkString(" ")                  // bullets > 0.9
    val ellipses = (1 to 12).map(i => s"trailing line $i...").mkString("\n") // ellipsis > 0.3
    val loop = Seq.fill(40)("same pair").mkString(" ")               // top bigram dominant
    val numeric = (1 to 60).map(_.toString).mkString(" ")            // alpha frac 0
    val short = "too short"                                          // n_words < 50
    val df = Seq(
      (1L, clean), (2L, dupLines), (3L, bullets), (4L, ellipses),
      (5L, loop), (6L, numeric), (7L, short)
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherFrame(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getBoolean(8), "clean doc must pass")
    assert(!got(2L).getBoolean(8) && got(2L).getDouble(4) > 0.3, "dup lines")
    assert(!got(3L).getBoolean(8) && got(3L).getDouble(5) > 0.9, "bullets")
    assert(!got(4L).getBoolean(8) && got(4L).getDouble(6) > 0.3, "ellipses")
    assert(!got(5L).getBoolean(8) && got(5L).getDouble(7) > 0.2, "dominant bigram")
    assert(!got(6L).getBoolean(8) && got(6L).getDouble(3) < 0.8, "alpha words")
    assert(!got(7L).getBoolean(8) && got(7L).getLong(1) < 50, "short doc")
    // dominant-bigram run math: "same pair same pair ..." has 79 bigrams,
    // 40 of them "pair same"? no: "same pair" appears 40 times, "pair same"
    // 39 — the max run over the sorted array must be exactly 40
    assert(got(5L).getDouble(7) == math.rint(40.0 / 79 * 1e6) / 1e6,
      s"expected 40/79 rounded, got ${got(5L).getDouble(7)}")
  }

  test("gopher native kernel is bit-identical to the HOF formulation") {
    import spark.implicits._
    // adversarial whitespace/split shapes on top of the planted-rule docs:
    // leading/trailing separators (empty words/lines under limit -1), \t and
    // \f runs, empty text, bullet/ellipsis lines, a unicode word (code-point
    // length), duplicate + looping structure
    val rnd = new scala.util.Random(42)
    val toks = Array("tok", "42", "a", "résumé", "- x", "...", "")
    val randomDocs = (100L until 160L).map { i =>
      val n = 1 + rnd.nextInt(120)
      val sep = Array(" ", "  ", "\t", "\n", " \n ", "\f")
      val body = (0 until n)
        .map(_ => toks(rnd.nextInt(toks.length)))
        .mkString(sep(rnd.nextInt(sep.length)))
      (i, (if (rnd.nextBoolean()) " " else "") + body +
        (if (rnd.nextBoolean()) "\n" else ""))
    }
    val handDocs = Seq(
      (1L, ""), (2L, "\n\n"), (3L, "  "), (4L, "- only\n- bullets..."),
      (5L, ("same pair " * 40).trim),
      (6L, "a\nb\na\nb\na"), (7L, (1 to 60).map(i => s"word$i").mkString(" ")))
    val df = (handDocs ++ randomDocs).toDF("doc_id", "text")
    val native = TextAnalysis.gopherFrame(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    val hof = TextAnalysis.gopherFrameHof(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    assert(native.keySet == hof.keySet)
    native.keySet.toSeq.sorted.foreach { k =>
      assert(native(k) == hof(k), s"doc $k: native=${native(k)} hof=${hof(k)}")
    }
  }

  test("word-ngram / bigram kernels are bit-identical to the HOF forms") {
    import org.apache.spark.sql.functions.{array, col, explode_outer, expr, lit, size, transform, sequence, struct, element_at, when}
    import spark.implicits._
    // adversarial arrays: empty, single word, shorter-than-n, null elements
    // (concat_ws skips them; bigram struct fields keep them), empties,
    // repeats, a unicode token
    val rnd = new scala.util.Random(7)
    val toks = Array("a", "bb", "", "résumé", null, "tok", "a")
    val rows: Seq[(Long, Seq[String])] =
      Seq(0L -> Seq.empty[String], 1L -> Seq("solo"), 2L -> Seq("x", "y")) ++
        (3L until 60L).map(i =>
          i -> Seq.fill(rnd.nextInt(9))(toks(rnd.nextInt(toks.length))).toSeq)
    val df = rows.toDF("id", "ws")
    for (n <- Seq(2, 3, 5)) {
      val hof = df.select(col("id"),
        explode_outer(TextAnalysis.ngramsOfWords(col("ws"), n)).as("g"))
        .collect().map(_.toSeq).toSeq.sorted(RowOrd)
      val nat = df.select(col("id"),
        explode_outer(graft.functions.WordNgrams.wordNgrams(col("ws"), n)).as("g"))
        .collect().map(_.toSeq).toSeq.sorted(RowOrd)
      assert(nat == hof, s"ngrams n=$n diverge")
    }
    val hofPairs = df.select(col("id"), explode_outer(
      when(size(col("ws")) >= 2, transform(sequence(lit(0), size(col("ws")) - 2),
        i => struct(element_at(col("ws"), i + 1).as("w1"),
          element_at(col("ws"), i + 2).as("w2"))))
        .otherwise(expr("cast(array() as array<struct<w1:string,w2:string>>)"))).as("p"))
      .select(col("id"), col("p.w1"), col("p.w2"))
      .collect().map(_.toSeq).toSeq.sorted(RowOrd)
    val natPairs = df.select(col("id"), explode_outer(
      graft.functions.WordBigrams.wordBigrams(col("ws"))).as("p"))
      .select(col("id"), col("p.w1"), col("p.w2"))
      .collect().map(_.toSeq).toSeq.sorted(RowOrd)
    assert(natPairs == hofPairs, "bigram pairs diverge")
  }

  /** Stable ordering for row-seq comparison (null-safe string render). */
  private val RowOrd: Ordering[Seq[Any]] =
    Ordering.by((s: Seq[Any]) => s.map(v => if (v == null) " " else v.toString).mkString("|"))

  test("simhash: identical texts collide, planted near-dups are close") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different words about spark shuffles and parquet files")
    ).toDF("doc_id", "text")
    val sigs = df.select(col("doc_id"), TextDedup.simhash64(col("text")).as("sig"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(2L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) > 3)
    val dups = TextDedup.simhashDuplicates(df, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(dups == Set((1L, 2L)))
  }

  test("simhashSignatures equals the column-level simhash64 oracle") {
    import spark.implicits._
    // the aggregate form derives bits from integer halves of the md5 —
    // must equal the digit-wise column form on every document
    val docs = Tables.documents(spark, sf)
    val fast = TextDedup.simhashSignatures(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val oracle = docs.select(col("doc_id"), TextDedup.simhash64(col("text")).as("sig"))
      .as[(Long, Long)].collect().toMap
    assert(fast.size == oracle.size && fast.nonEmpty)
    val diff = fast.collect { case (k, v) if oracle(k) != v => k }
    assert(diff.isEmpty, s"signatures differ for ${diff.take(5)}")

    // the r10 native kernel must be bit-identical to BOTH relational forms,
    // and its plan must be a pure narrow map — no exchange at all
    val native = TextDedup.simhashSignaturesNative(docs, "doc_id", "text")
    val nat = native.as[(Long, Long)].collect().toMap
    assert(nat == oracle, "native kernel diverges from the column oracle")
    // Spread's round-robin repartition (spreading a single-split scan) is
    // the ONLY exchange allowed — no hash shuffle, no aggregate
    val p = native.queryExecution.executedPlan.toString()
    assert(!p.contains("Exchange hashpartitioning"),
      s"native signatures must not hash-shuffle:\n$p")
    assert(!p.contains("HashAggregate"), s"native signatures must not aggregate:\n$p")
  }

  test("scorePairs equals the higher-order cosine form") {
    import spark.implicits._
    // HOF norm on purpose: with the native kernels on both sides this test
    // would compare a kernel to itself — the oracle stays r8-portable
    val base = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", VectorOps.normHof(col("v")))
      .limit(60).cache()
    val pairs = base.as("a").join(base.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.v").as("va"), col("b.v").as("vb"),
        col("a.nrm").as("na"), col("b.nrm").as("nb"))
    val fast = VectorOps.scorePairs(pairs)
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    val oracle = pairs.select(col("id_a"), col("id_b"),
        (VectorOps.dotHof(col("va"), col("vb")) / (col("na") * col("nb"))).as("sim"))
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(fast.size == oracle.size && fast.nonEmpty)
    // bit-identical: both accumulate the dot left-to-right in doubles
    val diff = fast.collect { case (k, v) if oracle(k) != v => k }
    assert(diff.isEmpty, s"cosines differ for ${diff.take(5)}")
  }

  test("batched media decode equals the columnar formulation") {
    val media = MediaOps.asMedia(Tables.documents(spark, sf), "doc_id", "text")
    val batched = MediaOps.decodeFeaturesBatched(media, batchSize = 7)
      .orderBy("media_id").collect()
    val columnar = MediaOps.featureColumns(media)
      .orderBy("media_id").collect()
    assert(batched.length == columnar.length && batched.length > 0)
    batched.zip(columnar).foreach { case (b, c) =>
      assert(b.getLong(0) == c.getLong(0))
      assert(b.getSeq[Int](3) == c.getSeq[Int](3),
        s"features differ for media_id ${b.getLong(0)}")
    }
  }

  test("stub media payloads are pure ASCII — the media_frames/media_resize oracle precondition") {
    // the DuckDB oracle slices text with char-based substr while Spark
    // slices the UTF-8 payload BYTES; they agree only while the corpus is
    // ASCII. A testdata regeneration that ships any non-ASCII character
    // must fail HERE with a named breadcrumb, not as a bare hash mismatch.
    val nonAscii = graft.Tables.documents(spark, sf)
      .filter(col("text").isNotNull &&
        not(col("text").rlike("^[\\x00-\\x7F]*$"))).count()
    assert(nonAscii == 0,
      s"$nonAscii non-ASCII documents: re-derive the media_frames and " +
        "media_resize oracles byte-wise")
  }

  test("frame sampling covers the timeline, slices byte-true, stays narrow") {
    import spark.implicits._
    // payload lengths straddling the stride boundaries: 0 (no frames),
    // 1, exactly one stride, stride+1, a tail shorter than frameBytes
    val docs = Seq(
      (1L, ""), (2L, "x"), (3L, "a" * 250), (4L, ("b" * 250) + "c"),
      (5L, (0 until 603).map(i => ('a' + i % 26).toChar).mkString)
    ).toDF("doc_id", "text")
    val media = MediaOps.asMedia(docs, "doc_id", "text")
    val got = MediaOps.sampleFrames(media, everyMs = 250, frameBytes = 16)
      .select("media_id", "frame_idx", "ts_ms", "frame", "n_frames")
      .as[(Long, Long, Long, Array[Byte], Long)].collect()
      .groupBy(_._1)
    assert(!got.contains(1L)) // zero-duration: no frames
    assert(got(2L).map(f => (f._2, f._3, f._5)).toSeq == Seq((0L, 0L, 1L)))
    assert(got(3L).map(_._2).sorted.toSeq == Seq(0L)) // len 250 -> 1 frame
    assert(got(4L).map(_._2).sorted.toSeq == Seq(0L, 1L)) // 251 -> 2
    assert(got(5L).map(_._2).sorted.toSeq == Seq(0L, 1L, 2L)) // 603 -> 3
    // byte-true slices, incl. the short tail (603 - 500 = 103 >= 16; use
    // doc 4's tail: offset 250, only 1 byte remains)
    val texts = Map(4L -> (("b" * 250) + "c"), 5L -> (0 until 603).map(i => ('a' + i % 26).toChar).mkString)
    for ((id, t) <- texts; (_, fi, ts, frame, _) <- got(id)) {
      val want = t.drop(ts.toInt).take(16).getBytes("UTF-8")
      assert(java.util.Arrays.equals(frame, want), s"media $id frame $fi")
      assert(ts == fi * 250)
    }
    // the plan is a narrow map: no exchange anywhere
    val plan = MediaOps.sampleFrames(media).queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"frame sampling must not shuffle:\n$plan")
    // the fan-out ceiling raises loudly instead of exploding
    val huge = MediaOps.asMedia(Seq((9L, "z" * 600)).toDF("doc_id", "text"),
      "doc_id", "text")
    val e = intercept[Exception] {
      MediaOps.sampleFrames(huge, everyMs = 10, maxFrames = 3).collect()
    }
    assert(e.getMessage.contains("maxFrames"), e.getMessage)
  }

  test("payload resize bounds output, strides byte-true, stays narrow") {
    import spark.implicits._
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    // lengths straddling the stride breakpoints for targetBytes=64:
    // 0 (empty), 1, 63/64 (stride 1, identity), 65/128 (stride 2), 700
    // (stride 11, m=64 — the hard ceiling)
    val texts = Map(
      1L -> "", 2L -> "x", 3L -> "a" * 63, 4L -> "b" * 64,
      5L -> (0 until 65).map(i => ('a' + i % 26).toChar).mkString,
      6L -> (0 until 128).map(i => ('a' + i % 26).toChar).mkString,
      7L -> (0 until 700).map(i => ('a' + i % 26).toChar).mkString)
    val docs = texts.toSeq.toDF("doc_id", "text")
    val media = MediaOps.asMedia(docs, "doc_id", "text")
    val got = MediaOps.resizePayload(media, targetBytes = 64)
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    for ((id, t) <- texts) {
      val n = t.length
      val k = math.max((n + 63) / 64, 1)
      val resized = (0 until (n + k - 1) / k).map(i => t(i * k)).mkString
      val (_, ob, st, nb, dig) = got(id)
      assert(ob == n && st == k && nb == resized.length &&
        dig == md5hex(resized), s"media $id: got $st/$nb")
      assert(nb <= 64, s"media $id resize exceeded the target: $nb")
    }
    assert(got(1L)._4 == 0L && got(1L)._5 == md5hex("")) // empty stays empty
    assert(got(4L)._4 == 64L && got(4L)._3 == 1L) // exact fit: identity
    assert(got(7L)._3 == 11L && got(7L)._4 == 64L) // ceiling case
    // zero-exchange narrow map
    val plan = MediaOps.resizePayload(media).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"resize must not shuffle:\n$plan")
  }

  test("language id picks the profile with the best score") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat sat of the mat and it is that for sure"),
      (2L, "el perro de la casa es un amigo de los vecinos por ahora"),
      (3L, "der hund und die katze ist von den nachbarn mit nicht ein problem")
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), TextAnalysis.langId(col("text")).as("l"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "en", 2L -> "es", 3L -> "de"))
  }

  test("repetition features count duplicated n-gram windows exactly") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b a b a"),        // bigrams: ab, ba, ab, ba -> 4 total, 2 distinct
      (2L, "x y z"),            // bigrams: xy, yz -> no repeats
      (3L, "w")                 // shorter than n: one truncated window
    ).toDF("doc_id", "text")
    val feats = TextAnalysis.repetitionFeatures(col("text"), n = 2)
    val got = df.select(col("doc_id") +: feats.map { case (n, c) => c.as(n) }: _*)
      .as[(Long, Long, Long, Double)].collect()
      .map { case (id, total, distinct, frac) => id -> ((total, distinct, frac)) }
      .toMap
    assert(got(1L) == ((4L, 2L, 0.5)))
    assert(got(2L) == ((2L, 2L, 0.0)))
    assert(got(3L) == ((1L, 1L, 0.0)))
  }

  test("boilerplate mining ranks grams by frequency with document reach") {
    import spark.implicits._
    val df = Seq(
      (1L, "end of file end of file"),  // "end of file" x2 (+ bridge grams)
      (2L, "end of file something"),
      (3L, "totally different words here")
    ).toDF("doc_id", "text")
    val top = TextAnalysis.boilerplateNgrams(df, "doc_id", "text", n = 3, k = 1)
      .as[(String, Long, Long)].collect()
    assert(top.sameElements(Array(("end of file", 3L, 2L))))
  }

  test("boilerplate minOccurrences pre-filter keeps the reachable top-k only") {
    import spark.implicits._
    val df = Seq(
      (1L, "end of file end of file"),
      (2L, "end of file something"),
      (3L, "totally different words here")
    ).toDF("doc_id", "text")
    // threshold 2: only "end of file" (3 occurrences) and the bridge gram
    // "of file end" (1) / singletons are cut before the exact count pass
    val pre = TextAnalysis.boilerplateNgrams(df, "doc_id", "text", n = 3, k = 10,
        minOccurrences = 2L)
      .as[(String, Long, Long)].collect()
    assert(pre.sameElements(Array(("end of file", 3L, 2L))), pre.mkString(","))
    // default threshold leaves behavior (and thus the driver hash) unchanged
    val all = TextAnalysis.boilerplateNgrams(df, "doc_id", "text", n = 3, k = 10)
      .as[(String, Long, Long)].collect()
    assert(all.head == (("end of file", 3L, 2L)) && all.length > 1)
  }

  test("kmeans-trained IVF centroids hold recall on the swappable search path") {
    val e = Tables.embeddings(spark, sf).cache()
    val q = e.filter(col("vec_id") % 50 === 0)
    val exact = VectorOps.bruteForceTopK(q, "vec_id", "embedding", e, "vec_id", "embedding", 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cents = VectorOps.kmeansCentroids(e, "vec_id", "embedding", k = 8, iters = 2)
    assert(cents.nonEmpty && cents.length <= 8, s"centroids=${cents.length}")
    assert(cents.map(_._1).distinct.length == cents.length, "duplicate centroid ids")
    val got = VectorOps.ivfTopKWith(q, "vec_id", "embedding", e, "vec_id", "embedding",
        cents, k = 5, nprobe = 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect got).size.toDouble / exact.size
    assert(recall >= 0.8, s"trained-IVF recall $recall < 0.8")
  }

  test("contaminated pairs equal a brute-force gram-set intersection") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).cache()
    val corpus = docs.filter(col("doc_id") % 20 =!= 0)
    val eval = docs.filter(col("doc_id") % 20 === 0)
    val got = TextDedup.contaminatedPairs(corpus, "doc_id", "text",
        eval, "doc_id", "text", shingleK = 5)
      .as[(Long, Long, Long)].collect().toSet
    def grams(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
      array_distinct(TextDedup.wordShingles(col("text"), 5)).as("g"))
    val expected = grams(corpus).as("c").join(grams(eval).as("e"))
      .select(col("c.doc_id"), col("e.doc_id").as("eval_id"),
        size(array_intersect(col("c.g"), col("e.g"))).cast("long").as("shared"))
      .filter(col("shared") > 0)
      .as[(Long, Long, Long)].collect().toSet
    assert(expected.nonEmpty, "fixture should contain planted contamination")
    assert(got == expected,
      s"missing=${(expected -- got).take(5)}, extra=${(got -- expected).take(5)}")
  }

  test("connected components match a union-find oracle on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7741L)
    for (trial <- 1 to 5) {
      val n = 40 + rnd.nextInt(60)
      val edges = Seq.fill(20 + rnd.nextInt(60))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // union-find oracle
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val expected = nodes.map { v =>
        // component min = min node id sharing the root
        val r = find(v.toInt)
        v -> nodes.filter(u => find(u.toInt) == r).min
      }.toMap
      val got = Clusters.connectedComponents(edges.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      assert(got == expected,
        s"trial $trial: diff=${(expected.toSet diff got.toSet).take(5)} / ${(got.toSet diff expected.toSet).take(5)}")
    }
  }

  test("connected components contract a worst-case path graph") {
    import spark.implicits._
    // a 64-node chain is the adversarial diameter case for label
    // propagation; alternating star must still label everything 0
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Clusters.connectedComponents(chain, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got.size == 64 && got.values.forall(_ == 0L), s"got=$got")
  }

  test("stratified sample matches a JVM md5-bucket oracle and is deterministic") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_id"))
      .cache()
    val rates = Map("en" -> 10, "es" -> 40, "de" -> 40, "fr" -> 40, "zh" -> 40)
    val got = Sampling.stratifiedSample(docs, "doc_id", col("lang_id"), rates)
      .as[(Long, String)].collect().toSet
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(id: Long): Int = {
      val hx = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      Integer.parseInt(hx.take(4), 16) % 100
    }
    val expected = docs.as[(Long, String)].collect()
      .filter { case (id, lang) => bucket(id) < rates(lang) }.toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(5)}, extra=${(got -- expected).take(5)}")
    assert(got.nonEmpty && got.size < expected.size + 1)
  }

  test("sequence packing fills bins greedily per shard") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), TextAnalysis.wsTokens(col("text")).as("_nt"))
    val budget = 512
    val got = Sampling.packSequences(docs, "doc_id", col("_nt"), budget, shards = 4)
      .select(col("doc_id"), col("n_tokens").cast("long"), col("shard"), col("bin"))
      .as[(Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.groupBy(_._3).foreach { case (shard, rows) =>
      var cum = 0L
      var bin = 0L
      rows.sortBy(_._1).foreach { case (id, nt, _, b) =>
        val expect = cum / budget
        assert(b == expect, s"shard $shard doc $id: bin $b != $expect")
        bin = expect
        cum += nt
      }
      // non-circular bin-size invariant (split-across-windows contract):
      // a bin may overflow the budget only by its LAST document's tokens —
      // dropping that document must bring it strictly under budget — and
      // every bin but the shard's last must reach the budget
      val byBin = rows.sortBy(_._1).groupBy(_._4).toSeq.sortBy(_._1)
      byBin.foreach { case (b, ds) =>
        val total = ds.map(_._2).sum
        val last = ds.maxBy(_._1)._2
        assert(total - last < budget,
          s"shard $shard bin $b: $total - last $last >= budget $budget")
      }
    }
  }

  test("embeddingDuplicates survives a planted hot bucket of 500 identical vectors") {
    import spark.implicits._
    // 500 identical embeddings: every LSH bucket they produce is over-cap,
    // so ALL of them route through the exact-signature fallback — one group
    // (identical signature), whose C(500,2) pairwise output is the operator
    // contract. Without the cap this is 32 tables x 500^2 = 8M candidate
    // rows before dedup; with it, exactly 124,750 after.
    val r = new scala.util.Random(7)
    val hot = Array.fill(64)(r.nextGaussian().toFloat)
    val rows =
      (0L until 500L).map(i => (i, hot.clone())) ++
      (500L until 600L).map(i => (i, Array.fill(64)(r.nextGaussian().toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    val out = VectorOps.embeddingDuplicates(df, "vec_id", "embedding",
        threshold = 0.45, bucketCap = 50)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    val hotPairs = out.filter { case (a, b) => a < 500 && b < 500 }
    assert(hotPairs.length === 500 * 499 / 2,
      s"expected all C(500,2) identical pairs, got ${hotPairs.length}")
    assert(out.forall { case (a, b) => a < b })
  }

  test("embedding index probe: batch parity, reload identity, over-cap fallback") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf).cache()
    val corpus = e.filter(col("vec_id") % 10 =!= 0)
    val batch = e.filter(col("vec_id") % 10 === 0)
    val idx = VectorOps.embeddingIndex(corpus, "vec_id", "embedding")
    val got = VectorOps.embeddingDuplicatesAgainst(batch, "vec_id", "embedding",
        idx, threshold = 0.45, bucketCap = 1 << 20)
      .as[(Long, Long, Double)].collect().toSet
    // parity: the full batch pipeline on the union, filtered to cross pairs
    val full = VectorOps.embeddingDuplicates(e, "vec_id", "embedding",
        threshold = 0.45, bucketCap = 1 << 20)
      .as[(Long, Long, Double)].collect()
      .filter { case (a, b, _) => (a % 10 == 0) != (b % 10 == 0) }
      .map { case (a, b, s) => if (a % 10 == 0) (a, b, s) else (b, a, s) }
      .toSet
    assert(got.nonEmpty, "fixture should contain cross near-dups")
    assert(got == full,
      s"missing=${(full -- got).take(4)}, extra=${(got -- full).take(4)}")
    // a saved+reloaded index probes identically
    val dir = java.nio.file.Files.createTempDirectory("graft-eidx").toString
    VectorOps.saveEmbeddingIndex(idx, dir)
    val reloaded = VectorOps.loadEmbeddingIndex(spark, dir)
    val viaReload = VectorOps.embeddingDuplicatesAgainst(batch, "vec_id",
        "embedding", reloaded, threshold = 0.45, bucketCap = 1 << 20)
      .as[(Long, Long, Double)].collect().toSet
    assert(viaReload == got)
    // over-cap fallback: 300 identical corpus vectors + 5 identical batch
    // copies blow every shared bucket past the cap; the exact
    // full-signature probe must still find all 300 per batch copy
    val r = new scala.util.Random(11)
    val hot = Array.fill(64)(r.nextGaussian().toFloat)
    val hotCorpus = (0L until 300L).map(i => (i * 10 + 1, hot.clone())).toDF("vec_id", "embedding")
    val hotBatch = (0L until 5L).map(i => (i * 10, hot.clone())).toDF("vec_id", "embedding")
    val hotIdx = VectorOps.embeddingIndex(hotCorpus, "vec_id", "embedding")
    val hotGot = VectorOps.embeddingDuplicatesAgainst(hotBatch, "vec_id",
        "embedding", hotIdx, threshold = 0.45, bucketCap = 20)
      .as[(Long, Long, Double)].collect()
    assert(hotGot.length == 5 * 300,
      s"expected every (batch, corpus) identical pair, got ${hotGot.length}")
    assert(hotGot.forall(_._3 == 1.0))
    idx.release(); hotIdx.release()
  }

  test("shuffleShards is a deterministic permutation with dense shard positions") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select("doc_id")
    val n = docs.count()
    val a = Sampling.shuffleShards(docs, "doc_id", shards = 16, seed = "42")
      .as[(Long, Long, Long)].collect().sortBy(r => (r._2, r._3))
    val b = Sampling.shuffleShards(docs, "doc_id", shards = 16, seed = "42")
      .as[(Long, Long, Long)].collect().sortBy(r => (r._2, r._3))
    assert(a.toSeq == b.toSeq, "same seed must reproduce the identical order")
    // a permutation: every id exactly once, shards in range
    assert(a.map(_._1).distinct.length.toLong == n)
    assert(a.forall { case (_, s, _) => s >= 0 && s < 16 })
    // positions dense 0..count-1 within each shard
    a.groupBy(_._2).foreach { case (s, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq,
        s"shard $s positions not dense")
    }
    // hash-shuffled, not id order: within-shard order must not be sorted
    // by id (P[sorted by chance] ~ 1/30!! per shard)
    assert(a.groupBy(_._2).exists { case (_, rows) =>
      val ids = rows.sortBy(_._3).map(_._1).toSeq
      ids != ids.sorted
    }, "within-shard order follows doc_id — not shuffled")
    // a different seed produces a different permutation
    val c = Sampling.shuffleShards(docs, "doc_id", shards = 16, seed = "43")
      .as[(Long, Long, Long)].collect().sortBy(r => (r._2, r._3))
    assert(c.map(_._1).toSeq != a.map(_._1).toSeq, "seed change did not reshuffle")
  }

  test("mixtureWeights normalizes temperature-scaled token masses") {
    import spark.implicits._
    val docs = Seq(
      ("a", 100L), ("a", 300L),   // source a: 400 tokens
      ("b", 1600L),               // source b: 1600 tokens
      ("c", 100L)                 // source c: 100 tokens
    ).toDF("source", "_nt")
    val out = Sampling.mixtureWeights(docs, "source", col("_nt"),
        alpha = 0.5, budgetTokens = 1000L)
      .as[(String, Long, Long, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    // sqrt masses: 20, 40, 10 -> z = 70
    assert(out("a")._2 == 2L && out("a")._3 == 400L)
    assert(math.abs(out("a")._4 - 20.0 / 70) < 1e-6)
    assert(math.abs(out("b")._4 - 40.0 / 70) < 1e-6)
    assert(math.abs(out("c")._4 - 10.0 / 70) < 1e-6)
    assert(out.values.map(_._4).sum > 0.999 && out.values.map(_._4).sum < 1.001)
    assert(out("b")._5 == math.floor(1000.0 * 40 / 70).toLong)
    // alpha=1 degenerates to proportional sampling
    val prop = Sampling.mixtureWeights(docs, "source", col("_nt"),
        alpha = 1.0, budgetTokens = 2100L)
      .as[(String, Long, Long, Double, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(math.abs(prop("b") - 1600.0 / 2100) < 1e-6)
  }

  test("semanticDuplicates prunes planted in-cluster near-dups and caps mega-cells") {
    import spark.implicits._
    val r = new scala.util.Random(11)
    // 30 spread-out base vectors + 3 planted copies of vector 7 (ids >= 100)
    val base = (0L until 30L).map(i => (i, Array.fill(64)(r.nextGaussian().toFloat)))
    val copies = Seq(100L, 101L, 102L).map { i =>
      (i, base(7)._2.map(x => x + 0.001f * r.nextGaussian().toFloat))
    }
    val df = (base ++ copies).toDF("vec_id", "embedding")
    val out = VectorOps.semanticDuplicates(df, "vec_id", "embedding",
        threshold = 0.9, minStride = 5)
      .select("drop_id", "keep_id").as[(Long, Long)].collect().toMap
    // every copy is prunable; its keeper is a lower-id near-identical twin
    assert(Set(100L, 101L, 102L).subsetOf(out.keySet),
      s"planted copies not pruned: $out")
    assert(out(100L) == 7L, s"copy 100 should keep original 7, got ${out(100L)}")
    assert(Set(7L, 100L).contains(out(101L)))
    // none of the spread-out base vectors (besides maybe 7's twins) drop
    assert(out.keySet.forall(id => id >= 100L || base.exists(_._1 == id)))

    // mega-cell: 400 identical vectors with a tiny cap still yield their
    // full pairwise pruning list via the LSH sub-split (identical vectors
    // share every sign bucket)
    val hot = Array.fill(64)(r.nextGaussian().toFloat)
    val big = (0L until 400L).map(i => (i, hot.clone())).toDF("vec_id", "embedding")
    val pruned = VectorOps.semanticDuplicates(big, "vec_id", "embedding",
        threshold = 0.99, minStride = 5, clusterCap = 50)
      .select("drop_id", "keep_id").as[(Long, Long)].collect()
    assert(pruned.length == 399, s"expected 399 pruned, got ${pruned.length}")
    assert(pruned.forall(_._2 == 0L), "keeper of identical copies must be id 0")
  }

  test("autoBits restores recall once fixed-bits buckets all exceed the cap") {
    import spark.implicits._
    val r = new scala.util.Random(23)
    val base = (0L until 2000L).map(i => (i, Array.fill(64)(r.nextGaussian().toFloat)))
    // 0.1-sigma perturbation: cosine ~0.995 (still >= 0.9) but several of
    // the 128 sign bits flip, so the copies' FULL signatures differ from
    // their originals (0.001-sigma copies keep identical signatures and the
    // exact-signature fallback legitimately catches them)
    val copies = Seq(
      (9000L, base(5)._2.map(x => x + 0.1f * r.nextGaussian().toFloat)),
      (9001L, base(77)._2.map(x => x + 0.1f * r.nextGaussian().toFloat)))
    val df = (base ++ copies).toDF("vec_id", "embedding")
    val planted = Set((5L, 9000L), (77L, 9001L))
    // fixed bits=4: 2002/16 = ~125 per bucket > cap 50, so EVERY bucket
    // routes to the exact-signature fallback — the near-dup copies have
    // differing signatures and vanish
    val fixed = VectorOps.embeddingDuplicates(df, "vec_id", "embedding",
        threshold = 0.9, bucketCap = 50)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert((fixed intersect planted) != planted,
      s"expected the fixed-bits recall cliff to drop a planted pair, got $fixed")
    // autoBits widens to ceil(log2(2002/25)) = 7 bits: buckets ~16 members,
    // the light pairwise path runs, near-identical copies collide in some
    // table with probability ~1
    val auto = VectorOps.embeddingDuplicates(df, "vec_id", "embedding",
        threshold = 0.9, bucketCap = 50, autoBits = true)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(planted.subsetOf(auto), s"autoBits missed planted pairs: $auto")
  }

  test("semanticDuplicatesWith prunes inside trained k-means cells") {
    import spark.implicits._
    val r = new scala.util.Random(13)
    val base = (0L until 40L).map(i => (i, Array.fill(64)(r.nextGaussian().toFloat)))
    val copies = Seq(200L, 201L).map { i =>
      (i, base(3)._2.map(x => x + 0.001f * r.nextGaussian().toFloat))
    }
    val df = (base ++ copies).toDF("vec_id", "embedding")
    val cents = VectorOps.kmeansCentroids(df, "vec_id", "embedding", k = 6)
    val out = VectorOps.semanticDuplicatesWith(df, "vec_id", "embedding",
        threshold = 0.9, cents)
      .select("drop_id", "keep_id").as[(Long, Long)].collect().toMap
    // a near-identical copy lands in its original's cell by construction
    // (same direction => same max-cosine centroid) and gets pruned there
    assert(Set(200L, 201L).subsetOf(out.keySet), s"copies not pruned: $out")
    assert(out(200L) == 3L)
  }

  test("pii counts and redaction hit planted PII and leave clean text alone") {
    import spark.implicits._
    val rows = Seq(
      (1L, "mail bob.smith+x@sub.example.org now"),
      (2L, "from 192.168.0.1 to 10.20.30.40 done"),
      (3L, "call +1 (555) 010-0199 today"),
      (4L, "mix a@b.io at 8.8.8.8 dial +49 30 1234567 end"),
      (5L, "clean text with version 2.5 and price 1.000,50"),
      (6L, "ssn 123-45-6789 card 4111 1111 1111 1111 ok"),
      // precision bias: a 3-2-4 digit date-range or a 4-4 grouping alone
      // must NOT fire the ssn/card patterns
      (7L, "pages 100-20-3000x and code 1234 5678 end"))
      .toDF("id", "t")
    val out = rows.select(col("id") +:
        TextAnalysis.piiCounts(col("t")).map { case (n, c) => c.as(n) } :+
          TextAnalysis.redactPii(col("t")).as("red"): _*)
      .as[(Long, Long, Long, Long, Long, Long, String)].collect()
      .map { case (id, e, ip, ssn, card, ph, red) =>
        id -> ((e, ip, ssn, card, ph, red)) }.toMap
    assert(out(1L) == ((1L, 0L, 0L, 0L, 0L, "mail <EMAIL> now")))
    assert(out(2L) == ((0L, 2L, 0L, 0L, 0L, "from <IP> to <IP> done")))
    assert(out(3L) == ((0L, 0L, 0L, 0L, 1L, "call <PHONE> today")))
    assert(out(4L) == ((1L, 1L, 0L, 0L, 1L, "mix <EMAIL> at <IP> dial <PHONE> end")))
    // precision bias: dotted versions / decimal prices / unprefixed numbers
    // must NOT be mangled
    assert(out(5L) == ((0L, 0L, 0L, 0L, 0L, "clean text with version 2.5 and price 1.000,50")))
    assert(out(6L) == ((0L, 0L, 1L, 1L, 0L, "ssn <SSN> card <CARD> ok")))
    assert(out(7L) == ((0L, 0L, 0L, 0L, 0L, "pages 100-20-3000x and code 1234 5678 end")))
  }

  test("duplicateSpans merges shared windows into maximal cross-doc spans") {
    import spark.implicits._
    val shared = "the quick brown fox jumps over" // 6 words => 4 3-gram windows
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta"),        // span at words [2,7]
      (2L, s"$shared epsilon zeta eta theta iota"),   // span at words [0,5]
      // intra-doc repetition only: its 3-grams repeat WITHIN the doc but
      // appear in no other document => no span (that axis is
      // repetitionFeatures, not substring dedup)
      (3L, "solo solo solo solo solo solo solo solo"))
      .toDF("doc_id", "text")
    val spans = TextDedup.duplicateSpans(docs, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, s, e, w) => id -> ((s, e, w)) }.toMap
    assert(spans == Map(1L -> ((2L, 7L, 4L)), 2L -> ((0L, 5L, 4L))), spans.toString)
    // minDocs above the sharing degree silences the pair
    assert(TextDedup.duplicateSpans(docs, "doc_id", "text", n = 3, minDocs = 3)
      .isEmpty)
  }

  test("duplicateSpans reports disjoint runs as separate spans") {
    import spark.implicits._
    val a = "one two three four" // 2 3-gram windows
    val b = "five six seven eight" // 2 more, separated by unique junk
    val docs = Seq(
      (1L, s"$a j1 j2 j3 $b"),
      (2L, s"$a k1 k2 k3 $b"))
      .toDF("doc_id", "text")
    val spans = TextDedup.duplicateSpans(docs, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    // per doc: [0,3] from a and [7,10] from b — NOT one merged [0,10]
    assert(spans == Set((1L, 0L, 3L, 2L), (1L, 7L, 10L, 2L),
      (2L, 0L, 3L, 2L), (2L, 7L, 10L, 2L)), spans.toString)
  }

  test("cutSpans removes exactly the span-covered words, keeps the rest in order") {
    import spark.implicits._
    val shared = "the quick brown fox jumps over" // 6 words
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta"),
      (2L, s"$shared epsilon zeta eta theta iota"),
      (3L, shared), // fully duplicated -> empty survivor
      (4L, "untouched words survive whole"))
      .toDF("doc_id", "text")
    val spans = TextDedup.duplicateSpans(docs, "doc_id", "text", n = 3)
    val out = TextDedup.cutSpans(docs, spans, "doc_id", "text")
      .as[(Long, String, Long)].collect()
      .map { case (id, t, nk) => id -> ((t, nk)) }.toMap
    assert(out(1L) == (("alpha beta gamma delta", 4L)), out(1L).toString)
    assert(out(2L) == (("epsilon zeta eta theta iota", 5L)), out(2L).toString)
    assert(out(3L) == (("", 0L)), out(3L).toString)
    assert(out(4L) == (("untouched words survive whole", 4L)), out(4L).toString)
  }

  test("incremental probe finds exactly the batch pipeline's cross pairs") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).cache()
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    // ground truth: the full batch pipeline over everything, restricted to
    // pairs that straddle the slice boundary
    val full = TextDedup.minhashDuplicates(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .collect { case (a, b, j) if (a % 10 == 0) != (b % 10 == 0) =>
        (if (a % 10 == 0) (a, b) else (b, a), j)
      }.toMap
    val idx = TextDedup.minhashIndex(corpus, "doc_id", "text")
    val inc = TextDedup.minhashDuplicatesAgainst(batch, "doc_id", "text", idx)
      .as[(Long, Long, Double)].collect()
      .map { case (n, o, j) => (n, o) -> j }.toMap
    assert(full.nonEmpty, "fixture should contain cross-slice near-dups")
    assert(inc == full, s"missing=${(full.keySet -- inc.keySet).take(3)}, " +
      s"extra=${(inc.keySet -- full.keySet).take(3)}")
  }

  test("a saved+reloaded index probes identically to the in-memory one") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).cache()
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val idx = TextDedup.minhashIndex(corpus, "doc_id", "text")
    val mem = TextDedup.minhashDuplicatesAgainst(batch, "doc_id", "text", idx)
      .as[(Long, Long, Double)].collect().toSet
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "mhidx").toString
    try {
      TextDedup.saveIndex(idx, dir)
      idx.release() // probes below must come from parquet, not cache
      val reloaded = TextDedup.loadIndex(spark, dir)
      val disk = TextDedup.minhashDuplicatesAgainst(batch, "doc_id", "text", reloaded)
        .as[(Long, Long, Double)].collect().toSet
      assert(mem.nonEmpty && disk == mem,
        s"missing=${(mem -- disk).take(3)}, extra=${(disk -- mem).take(3)}")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("incremental probe's exact fallback survives an over-cap boilerplate bucket") {
    import spark.implicits._
    val boiler = "spark spark data data table table scan scan join join"
    // 300 identical docs swamp every band bucket past the cap of 200
    val corpus = ((0L until 300L).map(i => (i, boiler)) :+
      (900L, "completely unrelated words here nothing shared at all ok"))
      .toDF("doc_id", "text")
    val batch = Seq((1000L, boiler)).toDF("doc_id", "text")
    val idx = TextDedup.minhashIndex(corpus, "doc_id", "text")
    val out = TextDedup.minhashDuplicatesAgainst(batch, "doc_id", "text", idx)
      .as[(Long, Long, Double)].collect()
    assert(out.length == 300 && out.forall { case (n, _, j) => n == 1000L && j == 1.0 },
      s"expected 300 exact matches, got ${out.length}")
  }

  test("holdoutSplit is a stable partition that agrees with the JVM bucket oracle") {
    import spark.implicits._
    val ids = (0L until 2000L).toDF("id")
    val out = Sampling.holdoutSplit(ids, "id", Seq("test" -> 2, "valid" -> 3))
      .as[(Long, String)].collect().toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    out.foreach { case (id, split) =>
      val b = Integer.parseInt(md5hex(id.toString).take(4), 16) % 100
      val expect = if (b < 2) "test" else if (b < 5) "valid" else "train"
      assert(split == expect, s"id $id bucket $b: $split != $expect")
    }
    // every row labeled; proportions near the requested percentages
    val bys = out.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(bys.keySet == Set("test", "valid", "train"))
    assert(bys("test") > 20 && bys("test") < 70, bys.toString)
    assert(bys("valid") > 30 && bys("valid") < 100, bys.toString)
    // growing the corpus never relabels an old id (lifetime stability)
    val grown = Sampling.holdoutSplit((0L until 4000L).toDF("id"), "id",
      Seq("test" -> 2, "valid" -> 3)).as[(Long, String)].collect().toMap
    assert(out.forall { case (id, s) => grown(id) == s })
  }

  test("domainCap keeps exactly the seeded-hash survivors, under-cap domains whole") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    // 120 docs on a crowded host (case/www/default-port noise the
    // canonicalizer collapses), 3 on a small one, 5 relative ('' domain)
    val rows = (0L until 120L).map(i => (i,
        s"https://WWW.Big.COM${if (i % 2 == 0) ":443" else ""}/p/$i")) ++
      (200L until 203L).map(i => (i, s"http://small.org/$i")) ++
      (300L until 305L).map(i => (i, s"/rel/$i"))
    val got = Sampling.domainCap(rows.toDF("doc_id", "url"),
        "doc_id", "url", maxPerDomain = 4, seed = "s1")
      .select("doc_id", "domain").as[(Long, String)].collect().toMap
    // JVM replica of the selection
    def survivors(ids: Seq[Long]) =
      ids.sortBy(i => (md5hex(s"s1:$i"), i)).take(4).toSet
    assert(got.filter(_._2 == "big.com").keySet == survivors(0L until 120L))
    assert(got.filter(_._2 == "small.org").keySet == Set(200L, 201L, 202L))
    assert(got.filter(_._2 == "").keySet == survivors(300L until 305L))
    assert(got.size == 4 + 3 + 4)
    // a different seed rotates the crowded domain's survivors
    val reseeded = Sampling.domainCap(rows.toDF("doc_id", "url"),
        "doc_id", "url", maxPerDomain = 4, seed = "s2")
      .select("doc_id", "domain").as[(Long, String)].collect().toMap
    assert(reseeded.filter(_._2 == "big.com").keySet !=
      got.filter(_._2 == "big.com").keySet)
    // the heap plan, not a global sort: one exchange, no Sort over all rows
    val p = Sampling.domainCap(rows.toDF("doc_id", "url"),
        "doc_id", "url", 4).queryExecution.executedPlan.toString()
    assert(p.contains("GroupTopK"), s"expected the bounded-heap node:\n$p")
  }

  test("duplicateSpans + cutSpans match a brute-force JVM oracle on random corpora") {
    import spark.implicits._
    val n = 3
    for (seed <- Seq(7, 23, 91)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
      val corpus = (0L until 30L).map { id =>
        id -> Array.fill(3 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val docs = corpus.toDF("doc_id", "text")

      // independent JVM re-derivation of the span semantics
      val words = corpus.map { case (id, t) => id -> t.split("\\s+").toSeq }.toMap
      def gramsOf(w: Seq[String]): Seq[(Int, String)] =
        (0 to math.max(w.length - n, 0)).map(i => i -> w.slice(i, i + n).mkString(" "))
      val docsPerGram = words.toSeq
        .flatMap { case (id, w) => gramsOf(w).map { case (_, g) => g -> id } }
        .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).distinct.size }
      val expectSpans = words.flatMap { case (id, w) =>
        val dupPos = gramsOf(w).collect { case (i, g) if docsPerGram(g) >= 2 => i }
        // merge adjacent positions into maximal runs
        dupPos.foldLeft(List.empty[(Int, Int, Int)]) {
          case ((s, e, c) :: rest, p) if p == e + 1 => (s, p, c + 1) :: rest
          case (acc, p) => (p, p, 1) :: acc
        }.map { case (s, e, c) => (id, s.toLong, (e + n - 1).toLong, c.toLong) }
      }.toSet
      val gotSpans = TextDedup.duplicateSpans(docs, "doc_id", "text", n)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(gotSpans == expectSpans,
        s"seed $seed: missing=${(expectSpans -- gotSpans).take(3)}, extra=${(gotSpans -- expectSpans).take(3)}")

      // cut: surviving words are exactly the positions no span covers
      val covered = expectSpans.groupBy(_._1).map { case (id, sp) =>
        id -> sp.flatMap { case (_, s, e, _) => s to e }.toSet
      }
      val expectCut = words.map { case (id, w) =>
        val kept = w.zipWithIndex.collect {
          case (x, i) if !covered.getOrElse(id, Set.empty).contains(i.toLong) => x
        }
        (id, kept.mkString(" "), kept.size.toLong)
      }.toSet
      val gotCut = TextDedup.cutSpans(docs,
          TextDedup.duplicateSpans(docs, "doc_id", "text", n), "doc_id", "text")
        .as[(Long, String, Long)].collect().toSet
      assert(gotCut == expectCut, s"seed $seed: cut mismatch")
    }
  }

  test("affinityWeights matches a JVM md5-bucket oracle and ranks target-like docs higher") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark data spark data spark data", "tgt"),
      (2L, "spark data spark data other words", "tgt"),
      (3L, "spark data spark data spark data", "raw"), // target-like raw doc
      (4L, "gravel moss lichen basalt fjord tundra", "raw"))
      .toDF("doc_id", "text", "source")
    val out = Sampling.affinityWeights(docs, "doc_id", "text",
        isTarget = col("source") === "tgt", buckets = 64, n = 2)
      .as[(Long, Long, Double)].collect()
      .map { case (id, ng, a) => id -> ((ng, a)) }.toMap

    // independent JVM re-derivation: bigrams -> md5 first-4-hex bucket ->
    // integer bucket sums -> one ratio
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def bigrams(t: String): Seq[Int] = {
      val w = t.toLowerCase.split("\\s+").toSeq
      (0 to math.max(w.length - 2, 0))
        .map(i => w.slice(i, i + 2).mkString(" "))
        .map(g => Integer.parseInt(md5hex(g).take(4), 16) % 64)
    }
    val all = Seq(1L -> "tgt", 2L -> "tgt", 3L -> "raw", 4L -> "raw")
    val texts = docs.as[(Long, String, String)].collect().map(r => r._1 -> r._2).toMap
    val cr = scala.collection.mutable.Map.empty[Int, Long].withDefaultValue(0L)
    val ct = scala.collection.mutable.Map.empty[Int, Long].withDefaultValue(0L)
    for ((id, src) <- all; b <- bigrams(texts(id))) {
      cr(b) += 1; if (src == "tgt") ct(b) += 1
    }
    val (nr, nt) = (cr.values.sum, ct.values.sum)
    for ((id, _) <- all) {
      val bs = bigrams(texts(id))
      val (st, sr) = (bs.map(ct).sum, bs.map(cr).sum)
      val expect = BigDecimal(st.toDouble * nr / (sr.toDouble * nt))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(out(id)._1 == bs.length && out(id)._2 == expect,
        s"doc $id: got ${out(id)}, expected ($st/$sr -> $expect)")
    }
    // the target-like raw doc scores like the target; alien vocab scores lower
    assert(out(3L)._2 > 1.0 && out(3L)._2 > out(4L)._2,
      s"affinity ordering wrong: ${out(3L)} vs ${out(4L)}")
  }

  test("ann_pq recall against brute-force top-5, and the index round-trips") {
    val e = Tables.embeddings(spark, sf).cache()
    val q = e.filter(col("vec_id") % 50 === 0)
    val exact = VectorOps.bruteForceTopK(q, "vec_id", "embedding", e, "vec_id", "embedding", 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val idx = ProductQuantization.pqIndex(e, "vec_id", "embedding", m = 8, ksub = 64, dim = 64)
    val approx = ProductQuantization.pqTopK(q, "vec_id", "embedding", idx, k = 5, refine = 8)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.6,
      s"PQ recall $recall < 0.6 (|exact|=${exact.size}, hit=${(exact intersect approx).size})")
    // persisted artifact probes identically to the in-memory one
    val dir = java.nio.file.Files.createTempDirectory("pqidx").toString
    ProductQuantization.savePqIndex(idx, dir)
    val reloaded = ProductQuantization.loadPqIndex(spark, dir, m = 8)
    assert(reloaded.codebook.length == idx.codebook.length &&
      reloaded.codebook.zip(idx.codebook).forall { case (a, b) => a.sameElements(b) })
    val again = ProductQuantization.pqTopK(q, "vec_id", "embedding", reloaded, k = 5, refine = 8)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == approx)
    // repeated query batches must not accumulate cached frames (an earlier
    // version persisted each batch's query projection and never released
    // it). Suites run concurrently on one SparkContext (r15), so a raw
    // getPersistentRDDs SIZE compare races other suites' cache churn —
    // scope the check to RDDs whose creation site is THIS spec (a leak
    // from these two calls materializes at the collect below and carries
    // this file in its call site).
    val before = spark.sparkContext.getPersistentRDDs.keySet
    ProductQuantization.pqTopK(q, "vec_id", "embedding", idx, k = 5, refine = 8).collect()
    ProductQuantization.ivfPqTopK(q, "vec_id", "embedding", idx, k = 5).collect()
    val leaked = (spark.sparkContext.getPersistentRDDs -- before.toSeq).values
      .filter(_.toString.contains("LlmOpsSpec"))
    assert(leaked.isEmpty, s"query batches leaked cached frames: $leaked")
    idx.release(); reloaded.release()
  }

  test("ann_ivf_pq recall: composed pruning still finds most exact neighbors") {
    val e = Tables.embeddings(spark, sf).cache()
    val q = e.filter(col("vec_id") % 50 === 0)
    val exact = VectorOps.bruteForceTopK(q, "vec_id", "embedding", e, "vec_id", "embedding", 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val idx = ProductQuantization.pqIndex(e, "vec_id", "embedding", m = 8, ksub = 64, dim = 64)
    val approx = ProductQuantization.ivfPqTopK(q, "vec_id", "embedding", idx,
        k = 5, minStride = 25, nprobe = 4, refine = 8)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // two prunings compose: floor sits below both ann_ivf's (0.85) and
    // ann_pq's (0.6) individual floors by design
    assert(recall >= 0.4,
      s"IVF+PQ recall $recall < 0.4 (hit=${(exact intersect approx).size}/${exact.size})")
    idx.release()
  }

  test("tfidfKeywords ranks by quantized idf with deterministic tie-break") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "apple dog dog dog"),
      (4L, "zebra yak")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfKeywords(docs, "doc_id", "text", k = 2)
      .as[(Long, String, Long, Long, Long)].collect().toSet
    // N=4; df: apple 2, banana 2, cherry 1, dog 1, yak 1, zebra 1
    // idf_ppm = (4e6 div df); score = tf * idf_ppm
    val expect = Set(
      (1L, "apple", 2L, 4000000L, 1L), (1L, "banana", 1L, 2000000L, 2L),
      (2L, "cherry", 1L, 4000000L, 1L), (2L, "banana", 1L, 2000000L, 2L),
      (3L, "dog", 3L, 12000000L, 1L), (3L, "apple", 1L, 2000000L, 2L),
      // equal scores: rank by word asc — deterministic
      (4L, "yak", 1L, 4000000L, 1L), (4L, "zebra", 1L, 4000000L, 2L))
    assert(out == expect)
  }

  test("lineDedup cuts every occurrence of a corpus-frequent line, keeps rare ones") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    // COMMON reaches 4 distinct docs (>= minDocs 3; twice inside doc 6 —
    // distinct-doc df counts it once, the cut removes both occurrences);
    // RARE reaches only 2 and must survive
    val docs = Seq(
      (1L, "alpha beta\nCOMMON\ngamma"),
      (2L, "COMMON\ndelta"),
      (3L, "epsilon\nCOMMON"),
      (4L, "zeta\nRARE"),
      (5L, "RARE\neta"),
      (6L, "COMMON\nCOMMON\ntheta"),
      (7L, "COMMON")).toDF("doc_id", "text")
    val out = TextAnalysis.lineDedup(docs, "doc_id", "text", minDocs = 3)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val expect = Map(
      1L -> (3L, 1L, "alpha beta\ngamma"),
      2L -> (2L, 1L, "delta"),
      3L -> (2L, 1L, "epsilon"),
      4L -> (2L, 0L, "zeta\nRARE"),
      5L -> (2L, 0L, "RARE\neta"),
      6L -> (3L, 2L, "theta"),
      7L -> (1L, 1L, "")) // fully boilerplate: survives as empty, not dropped
    assert(out.keySet == expect.keySet)
    expect.foreach { case (id, (nl, nr, clean)) =>
      assert(out(id) == ((nl, nr, md5hex(clean))), s"doc $id: got ${out(id)}")
    }
  }

  test("budgetSelect: whole strata fit, the crossing stratum fills in seeded order") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    // strata: score 3 = {1, 2} (10 tokens each), score 2 = {3} (30),
    // score 1 = {4, 5, 6, 7} (5 each) — totals 20 / 30 / 20, corpus 70
    val docs = Seq(
      (1L, 3L, 10L), (2L, 3L, 10L), (3L, 2L, 30L),
      (4L, 1L, 5L), (5L, 1L, 5L), (6L, 1L, 5L), (7L, 1L, 5L))
      .toDF("doc_id", "score", "tok").repartition(5)
    def sel(budget: Long): Set[Long] =
      Sampling.budgetSelect(docs, "doc_id", "score", "tok", budget)
        .select("doc_id").as[Long].collect().toSet
    // budget 53: strata 3+2 fit (cum 50); the score-1 remainder is 3 —
    // every score-1 doc costs 5, so none admits
    assert(sel(53) == Set(1L, 2L, 3L))
    // budget 57: remainder 7 admits exactly the FIRST score-1 doc in
    // seeded md5 order (5 <= 7; the second would reach 10)
    val hashOrder = Seq(4L, 5L, 6L, 7L).sortBy(id => (md5hex(s"sel0:$id"), id))
    assert(sel(57) == Set(1L, 2L, 3L, hashOrder.head))
    // budget >= corpus: everything; budget below the top stratum's
    // cheapest doc: nothing (no full strata, remainder 5 < 10)
    assert(sel(70) == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L))
    assert(sel(5) == Set.empty[Long])
    // exact budget edge: cum == budget is a FULL stratum, no boundary
    assert(sel(50) == Set(1L, 2L, 3L))
    // partitioning invariance (no rand(), hash order only)
    assert(Sampling.budgetSelect(docs.repartition(1), "doc_id", "score",
      "tok", 57).select("doc_id").as[Long].collect().toSet == sel(57))
  }

  test("budgetSelect equals the global-sort greedy reference on random corpora") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val rng = new scala.util.Random(83)
    for (trial <- 0 until 5) {
      val n = 200 + rng.nextInt(300)
      val rows = Seq.tabulate(n)(i =>
        (i.toLong, rng.nextInt(10).toLong, (1 + rng.nextInt(20)).toLong))
      val total = rows.map(_._3).sum
      val budget = rng.nextLong(total + 1)
      // reference: ONE global greedy pass over (score desc, hash, id)
      val want = rows
        .sortBy { case (id, sc, _) => (-sc, md5hex(s"sel0:$id"), id) }
        .scanLeft((0L, 0L)) { case ((_, cum), (id, _, tok)) => (id, cum + tok) }
        .drop(1).takeWhile(_._2 <= budget).map(_._1).toSet
      val got = Sampling.budgetSelect(
          rows.toDF("doc_id", "score", "tok").repartition(7),
          "doc_id", "score", "tok", budget)
        .select("doc_id").as[Long].collect().toSet
      assert(got == want, s"trial=$trial n=$n budget=$budget")
    }
  }

  test("collocations: exact integer lift, PMI-faithful ranking, minCount prune") {
    import spark.implicits._
    // 'aa bb' is a FUSED pair (bb only ever follows aa); 'cc dd' co-occurs
    // sometimes; 'ee ff' co-occurs only twice (pruned by minCount 3).
    // Filler 'xx' pads the unigram mass so lifts differ.
    val docs = (
      Seq.fill(6)("aa bb xx xx") ++
      Seq.fill(6)("cc dd xx cc") ++  // cc also appears away from dd
      Seq.fill(2)("ee ff xx xx")
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = TextAnalysis.collocations(docs, "text", minCount = 3L, k = 10)
      .select("w1", "w2", "n_pair", "n_w1", "n_w2", "lift_ppm", "rank")
      .as[(String, String, Long, Long, Long, Long, Int)].collect()
    val m = got.map(r => (r._1, r._2) -> r).toMap
    // total tokens: 6*4 + 6*4 + 2*4 = 56
    val t = 56L
    def lift(pair: Long, a: Long, b: Long) =
      (BigInt(1000000) * pair * t / (BigInt(a) * b)).toLong
    assert(m(("aa", "bb"))._3 == 6L &&
      m(("aa", "bb"))._6 == lift(6, 6, 6))        // 1e6·6·56/36
    assert(m(("cc", "dd"))._6 == lift(6, 12, 6))  // cc has 12 occurrences
    assert(!m.contains(("ee", "ff")), "minCount must prune the rare pair")
    // PMI ordering: the fused pair's lift strictly above the diluted one
    assert(m(("aa", "bb"))._6 > m(("cc", "dd"))._6)
    assert(got.filter(_._7 == 1).head._1 == "aa")
  }
}
