package graft.streaming

import graft.SparkSpec
import graft.operators.TextDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming near-dup detection: banding must be bit-identical to the batch
  * LSH pipeline, the streamed pair set must match batch dedup on a planted
  * corpus, and bucket state must honor the FIFO cap.
  *
  * [[StreamingDedupRocksDbSpec]] re-runs the suite under the RocksDB state
  * store provider (see [[StreamingSpec]]'s scaladoc for why).
  */
class StreamingDedupSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  protected def stateStoreProvider: Option[String] = None

  override protected def beforeAll(): Unit = {
    super.beforeAll()
    stateStoreProvider.foreach(
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", _))
  }

  override protected def afterAll(): Unit = {
    if (stateStoreProvider.isDefined)
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    super.afterAll()
  }

  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again today"),
    (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
    (4L, "one two three four five six seven eight nine ten eleven twelve"),
    (5L, "the quick brown fox jumps over the lazy cat again and again today")
  )

  test("streaming banding is bit-identical to the batch LSH band rows") {
    val docs = corpus.toDF("doc_id", "text")
    val sh = docs.select(col("doc_id").as("id"),
      array_distinct(transform(
        TextDedup.shinglesOfWords(split(col("text"), "\\s+"), 3),
        s => xxhash64(s))).as("hs"))
    val batch = TextDedup.minhashBandRows(sh, 128, 64)
      .select(col("id").cast("long"), col("bk.band"), col("bk.bucket"))
      .as[(Long, Int, Long)].collect().toSet
    val streamForm = StreamingDedup.bandedDocs(docs, "doc_id", "text", 3, 128, 64)
      .map(d => (d.id, d.band, d.bucket)).collect().toSet
    assert(streamForm == batch,
      s"banding diverged: only-stream=${(streamForm -- batch).take(3)} " +
        s"only-batch=${(batch -- streamForm).take(3)}")
  }

  test("streamed pair set matches batch minhash dedup across micro-batches") {
    val batchPairs = TextDedup.minhashDuplicates(
        corpus.toDF("doc_id", "text"), "doc_id", "text")
      .select(col("id_a").cast("long"), col("id_b").cast("long"))
      .as[(Long, Long)].collect().toSet
    assert(batchPairs == Set((1L, 2L), (1L, 5L), (2L, 5L)),
      s"unexpected batch ground truth: $batchPairs")

    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val pairs = StreamingDedup.minhashPairsStream(
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val query = pairs.writeStream.format("memory").queryName("stream_dedup")
      .outputMode("append").start()
    try {
      // duplicates split across micro-batches AND within one batch
      ms.addData(corpus(0), corpus(2)) // d1, d3
      query.processAllAvailable()
      ms.addData(corpus(1), corpus(3), corpus(4)) // d2, d4, d5
      query.processAllAvailable()
      val got = spark.table("stream_dedup")
        .select("id_a", "id_b").distinct()
        .as[(Long, Long)].collect().toSet
      assert(got == batchPairs, s"stream=$got batch=$batchPairs")
      // the exact duplicate's signature estimate is exactly 1.0
      val est = spark.table("stream_dedup")
        .filter(col("id_a") === 1L && col("id_b") === 2L)
        .select(max("est_jaccard")).as[Double].head()
      assert(est == 1.0, s"exact dup estimated at $est")
    } finally query.stop()
  }

  test("streaming decontamination matches the batch gram-overlap pairs") {
    val evalSet = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (200L, "completely unrelated benchmark question text here okay")
    ).toDF("eval_id", "text")
    val batch = TextDedup.contaminatedPairs(
        corpus.toDF("doc_id", "text"), "doc_id", "text",
        evalSet, "eval_id", "text")
      .select(col("doc_id").cast("long"), col("eval_id").cast("long"),
        col("shared").cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty && batch.forall(_._2 == 100L),
      s"expected contamination only against eval doc 100: $batch")

    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val matches = StreamingDedup.contaminatedPairsStream(
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text",
      evalSet, "eval_id", "text")
    val query = matches.writeStream.format("memory").queryName("stream_decon")
      .outputMode("append").start()
    try {
      ms.addData(corpus(0), corpus(1))
      query.processAllAvailable()
      ms.addData(corpus(2), corpus(3), corpus(4))
      query.processAllAvailable()
      // a doc's matches land in one batch, so the global distinct-gram count
      // per (doc, eval) equals the batch operator's `shared`
      val got = spark.table("stream_decon")
        .groupBy("doc_id", "eval_id")
        .agg(count_distinct(col("g")).as("shared"))
        .as[(Long, Long, Long)].collect().toSet
      assert(got == batch, s"stream=$got batch=$batch")
    } finally query.stop()
  }

  test("adversarial hot bucket: 500 identical docs, state and pairs stay cap-bounded") {
    // the streaming analogue of the batch census cap: every doc hashes to
    // the SAME bucket in every band, the worst case a boilerplate corpus
    // produces. With bucketCap=10 the state per bucket group never exceeds
    // 10 members and each arrival compares against at most 10 — work is
    // O(N * cap), not O(N^2).
    implicit val sqlCtx = spark.sqlContext
    val same = "identical words repeated for every single document here now"
    val n = 500
    val cap = 10
    val bands = 4
    val ms = MemoryStream[(Long, String)]
    val pairs = StreamingDedup.minhashPairsStream(
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text",
      numHashes = 8, bands = bands, bucketCap = cap)
    val query = pairs.writeStream.format("memory").queryName("stream_dedup_hot")
      .outputMode("append").start()
    try {
      (1L to n).grouped(100).foreach { chunk =>
        ms.addData(chunk.map(i => (i, same)))
        query.processAllAvailable()
      }
      val got = spark.table("stream_dedup_hot")
        .select("id_a", "id_b").as[(Long, Long)].collect()
      // doc i pairs with min(i-1, cap) window members, once per band
      val expected = (1 to n).map(i => math.min(i - 1, cap)).sum * bands
      assert(got.length == expected, s"rows=${got.length} expected=$expected")
      // FIFO window: a pair's ids are never further apart than the cap
      assert(got.forall { case (a, b) => b - a <= cap },
        s"pair outside the recency window: ${got.filter { case (a, b) => b - a > cap }.take(3).toSeq}")
    } finally query.stop()
  }

  test("bucket cap evicts FIFO: detection runs against the recency window") {
    implicit val sqlCtx = spark.sqlContext
    val same = "identical words repeated for every single document here now"
    val ms = MemoryStream[(Long, String)]
    val pairs = StreamingDedup.minhashPairsStream(
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text", bucketCap = 1)
    val query = pairs.writeStream.format("memory").queryName("stream_dedup_cap")
      .outputMode("append").start()
    try {
      ms.addData((1L, same))
      query.processAllAvailable()
      ms.addData((2L, same)) // pairs with 1, then evicts it (cap=1)
      query.processAllAvailable()
      ms.addData((3L, same)) // pairs with 2 only — 1 is outside the window
      query.processAllAvailable()
      val got = spark.table("stream_dedup_cap")
        .select("id_a", "id_b").distinct()
        .as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 2L), (2L, 3L)), s"got $got")
    } finally query.stop()
  }

  // planted embedding corpus: 20 spread-out directions + near-copies of two
  // of them (64-dim, the batch default)
  private def plantedVecs: Seq[(Long, Array[Float])] = {
    val r = new scala.util.Random(17)
    val base = (0L until 20L).map(i => (i, Array.fill(64)(r.nextGaussian().toFloat)))
    val copies = Seq(
      (100L, base(4)._2.map(x => x + 0.001f * r.nextGaussian().toFloat)),
      (101L, base(4)._2.map(x => x + 0.001f * r.nextGaussian().toFloat)),
      (102L, base(9)._2.map(x => x + 0.001f * r.nextGaussian().toFloat)))
    base ++ copies
  }

  test("streaming vector bucketing is bit-identical to batch bucketRows") {
    val planes = graft.operators.VectorOps.hyperplanes(tables = 8, bits = 4, dim = 64)
    val df = plantedVecs.toDF("vec_id", "embedding")
    val base = df.select(col("vec_id").as("id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val batch = graft.operators.VectorOps.bucketRows(base, "id", "v", planes)
      .select(col("id").cast("long"), col("bk.table"), col("bk.bucket"))
      .as[(Long, Int, Long)].collect().toSet
    val streamForm = StreamingDedup.bucketedVecs(df, "vec_id", "embedding", planes)
      .map(d => (d.id, d.table, d.bucket)).collect().toSet
    assert(streamForm == batch,
      s"buckets diverged: only-stream=${(streamForm -- batch).take(3)} " +
        s"only-batch=${(batch -- streamForm).take(3)}")
  }

  test("streamed embedding pair set matches batch embeddingDuplicates") {
    val batchPairs = graft.operators.VectorOps.embeddingDuplicates(
        plantedVecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
        threshold = 0.9)
      .select(col("id_a").cast("long"), col("id_b").cast("long"))
      .as[(Long, Long)].collect().toSet
    assert(batchPairs == Set((4L, 100L), (4L, 101L), (100L, 101L), (9L, 102L)),
      s"unexpected batch ground truth: $batchPairs")

    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Array[Float])]
    val pairs = StreamingDedup.embeddingPairsStream(
      ms.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      threshold = 0.9)
    val query = pairs.writeStream.format("memory").queryName("stream_vecdedup")
      .outputMode("append").start()
    try {
      // copies split across micro-batches AND within one batch
      val vs = plantedVecs
      ms.addData(vs.filter(_._1 <= 9L))
      query.processAllAvailable()
      ms.addData(vs.filter(v => v._1 > 9L && v._1 != 101L))
      query.processAllAvailable()
      ms.addData(vs.filter(_._1 == 101L))
      query.processAllAvailable()
      val got = spark.table("stream_vecdedup")
        .select("id_a", "id_b").distinct()
        .as[(Long, Long)].collect().toSet
      assert(got == batchPairs, s"stream=$got batch=$batchPairs")
      // near-identical copies score within a rounding step of batch's sim
      val sim = spark.table("stream_vecdedup")
        .filter(col("id_a") === 100L && col("id_b") === 101L)
        .select(max("sim")).as[Double].head()
      assert(sim > 0.999, s"copy pair scored $sim")
    } finally query.stop()
  }

  test("vector bucket index survives a query restart through the checkpoint") {
    // the copies arrive only AFTER the restart, so detecting (4, 100)
    // requires vector 4's stored unit direction to round-trip through the
    // state store
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt-vec").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-out-vec").toString
    val ms = MemoryStream[(Long, Array[Float])]
    val pairs = StreamingDedup.embeddingPairsStream(
      ms.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      threshold = 0.9)
    def start() = pairs.writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()

    val vs = plantedVecs
    val q1 = start()
    ms.addData(vs.filter(_._1 < 20L)) // base only — no pairs yet
    q1.processAllAvailable()
    q1.stop()

    val q2 = start()
    ms.addData(vs.filter(_._1 >= 20L)) // the three near-copies
    q2.processAllAvailable()
    try {
      val got = spark.read.parquet(outDir)
        .select("id_a", "id_b").distinct().as[(Long, Long)].collect().toSet
      assert(got == Set((4L, 100L), (4L, 101L), (100L, 101L), (9L, 102L)),
        s"post-restart pairs: $got")
    } finally q2.stop()
  }
}
