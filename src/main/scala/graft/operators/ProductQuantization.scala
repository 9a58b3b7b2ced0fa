package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Product-quantization ANN (Jégou et al. 2011, "Product quantization for
  * nearest neighbor search") — the memory-compression scale path that
  * completes the ANN ladder (brute → LSH → IVF → PQ): each corpus vector
  * is stored as `m` small codes (one byte-ish each) instead of `dim`
  * floats, and the query scan reads ONLY the code table plus a per-query
  * distance table — at dim 64 / m 8 that is 8 ints + a norm per vector vs
  * 64 floats, and the ratio widens with dim. At 100 TB this is the
  * difference between an index that fits executor memory and one that
  * doesn't.
  *
  * Determinism stance (same as [[VectorOps.ivfTopK]]): the codebook is the
  * subvectors of every `stride`-th corpus vector by ascending id — no
  * iterative training — so the DuckDB oracle can replay codebook, encode,
  * ADC scan, and rerank EXACTLY; `ann_pq` is hash-checked, not just
  * recall-floor-tested. Asymmetric distance (ADC) scores are rounded
  * half-up to 6 before the candidate cut so a last-bit summation
  * difference across engines cannot flip the candidate set; ties break by
  * ascending neighbor id.
  *
  * Scale shape: encode is one narrow per-partition pass over a broadcast
  * codebook (O(N·m·ksub·dsub) flops, no shuffle); the query scan is one
  * narrow pass over the CODES table emitting only per-partition top-R
  * rows per query (two-phase top-k — partition-independent result);
  * rerank joins the R global survivors back to stored vectors and scores
  * with the native codegen kernel. Queries and codebook are
  * driver-collected and broadcast — bounded by the [[VectorOps]]
  * broadcast-sized-queries contract (Q·dim + ksub·dim doubles).
  */
object ProductQuantization {

  /** Codebook stride targeting ~`ksub` codewords (mirrored verbatim by the
    * `ann_pq` oracle SQL — change both together).
    */
  def pqStride(n: Long, ksub: Int): Long =
    math.max(1L, math.ceil(n.toDouble / ksub).toLong)

  /** The compact artifact: `codes` = (nid, nn, c0..c{m-1} as array<int>),
    * `vectors` = (nid, nv, nn) for exact rerank, `codebook` = flat
    * [code][dim] row-major matrix.
    */
  final case class PqIndex(codes: DataFrame, vectors: DataFrame,
                           codebook: Array[Array[Double]], m: Int) {
    def release(): Unit = {
      codes.unpersist(blocking = false)
      vectors.unpersist(blocking = false)
    }
  }

  /** Build the [[PqIndex]]: stride-sampled codebook (ascending id order →
    * code index), then one narrow encode pass. `dim` must be divisible by
    * `m`; a vector's subspace `j` spans dims `[j*dsub, (j+1)*dsub)`.
    * Encode picks `argmin_code Σ_d (v_d - cw_d)²` per subspace, ties to
    * the smaller code, doubles accumulated in dimension order.
    */
  def pqIndex(corpus: DataFrame, id: String, vec: String,
              m: Int = 8, ksub: Int = 16, dim: Int = 64): PqIndex = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val dsub = dim / m
    val base = Spread(corpus).select(col(id).cast("long").as("nid"),
        transform(col(vec), x => x.cast("double")).as("nv"))
      .withColumn("nn", VectorOps.norm(col("nv")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = base.count()
    val stride = pqStride(n, ksub)
    val cb: Array[Array[Double]] = base.filter(col("nid") % stride === 0)
      .orderBy("nid").select("nv")
      .collect().map(_.getSeq[Double](0).toArray)
    val bc = base.sparkSession.sparkContext.broadcast(cb)
    val outSchema = StructType(Seq(
      StructField("nid", LongType),
      StructField("nn", DoubleType),
      StructField("codes", ArrayType(IntegerType, containsNull = false))))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val codes = base.select("nid", "nv", "nn").mapPartitions { rows =>
      val book = bc.value
      rows.map { r =>
        val v = r.getSeq[Double](1)
        val cs = new Array[Int](m)
        var j = 0
        while (j < m) {
          val off = j * dsub
          var best = 0
          var bestD = Double.MaxValue
          var c = 0
          while (c < book.length) {
            val cw = book(c)
            var s = 0.0
            var d = 0
            while (d < dsub) {
              val diff = v(off + d) - cw(off + d)
              s += diff * diff
              d += 1
            }
            if (s < bestD) { bestD = s; best = c } // strict < => ties keep smaller c
            c += 1
          }
          cs(j) = best
          j += 1
        }
        Row(r.getLong(0), r.getDouble(2), cs.toSeq)
      }
    }(enc).persist(StorageLevel.MEMORY_AND_DISK)
    PqIndex(codes, base, cb, m)
  }

  /** Persist the artifact: codes + vectors as parquet, codebook as one
    * (code, v) table — build once, reload per query batch.
    */
  def savePqIndex(index: PqIndex, path: String): Unit = {
    index.codes.write.mode("overwrite").parquet(s"$path/codes")
    index.vectors.write.mode("overwrite").parquet(s"$path/vectors")
    val spark = index.codes.sparkSession
    import spark.implicits._
    index.codebook.zipWithIndex.map { case (v, c) => (c, v.toSeq) }.toSeq
      .toDF("code", "v").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/codebook")
  }

  def loadPqIndex(spark: SparkSession, path: String, m: Int): PqIndex = {
    val cb = spark.read.parquet(s"$path/codebook").orderBy("code")
      .select("v").collect().map(_.getSeq[Double](0).toArray)
    PqIndex(spark.read.parquet(s"$path/codes"),
      spark.read.parquet(s"$path/vectors"), cb, m)
  }

  /** IVF + PQ — the production ANN composition: the coarse quantizer
    * ([[VectorOps.ivfTopK]]'s deterministic stride centroids) prunes the
    * corpus to `nprobe` inverted lists per query, and the PQ CODE table
    * is all that is read inside the probed lists (ADC scoring, rounded
    * half-up to 6 before the cut); the `k*refine` global survivors get
    * the exact rerank. At 100 TB the two prunings compose: the list
    * probe bounds the scanned FRACTION (`nprobe / #centroids`), the
    * codes bound the BYTES per scanned row — raw vectors are touched
    * only for the rerank joins. Fully deterministic, so the `ann_ivf_pq`
    * oracle replays centroid assignment, probes, codebook, encode, ADC,
    * and rerank exactly.
    */
  def ivfPqTopK(queries: DataFrame, qid: String, qvec: String,
                index: PqIndex, k: Int, minStride: Int = 25, nprobe: Int = 4,
                refine: Int = 8, maxCentroids: Int = 1 << 16,
                maxCentroidBytes: Long = 64L << 20): DataFrame = {
    val m = index.m
    val book = index.codebook
    val dim = book.headOption.map(_.length).getOrElse(0)
    val dsub = if (m == 0) 0 else dim / m
    val cBase = index.vectors // (nid, nv, nn, [k]) — persisted by pqIndex
    // queries are broadcast-sized by contract: collect ONCE, then rebuild
    // the tiny frame from the collected rows — no persist to leak across
    // repeated query batches in a long-lived session (an earlier version
    // cached each batch's qBase and never unpersisted it)
    val spark = queries.sparkSession
    val qRows: Array[(Long, Array[Double], Double)] = queries
      .select(col(qid).cast("long").as("qid"),
        transform(col(qvec), x => x.cast("double")).as("qv"))
      .withColumn("qn", VectorOps.norm(col("qv")))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    import spark.implicits._
    val qBase = qRows.toSeq.map { case (i, v, n) => (i, v.toSeq, n) }
      .toDF("qid", "qv", "qn")
    val stride = VectorOps.ivfStride(cBase.count(), minStride,
      VectorOps.centroidBudget(dim, maxCentroids, maxCentroidBytes))
    val cents: Array[(Long, Array[Double], Double)] =
      cBase.filter(col("nid") % stride === 0).orderBy("nid")
        .select("nid", "nv", "nn")
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    val assignN = VectorOps.assignCentroids(
      cBase.select("nid", "nv", "nn"), "nid", "nv", "nn", cents, 1)
    val probesQ = VectorOps.assignCentroids(
      qBase, "qid", "qv", "qn", cents, nprobe)
    // candidates: CODES of the probed lists only — id/code rows, never
    // raw vectors (each corpus vector lives in exactly one list, so a
    // (qid, nid) pair appears at most once)
    val cand = index.codes.join(assignN, "nid")
      .join(broadcast(probesQ), Seq("cid"))
      .filter(col("qid") =!= col("nid"))
      .select("qid", "nid", "nn", "codes")
    val sc = spark.sparkContext
    val bcQ = sc.broadcast(qRows)
    val bcB = sc.broadcast(book)
    val rTop = k * refine
    val outSchema = StructType(Seq(
      StructField("qid", LongType),
      StructField("nid", LongType),
      StructField("adc", DoubleType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val partTop = cand.mapPartitions { rows =>
      val qs = bcQ.value
      val cb = bcB.value
      val qIdx = qs.iterator.zipWithIndex.map { case (q, i) => q._1 -> i }.toMap
      // lazily-built per-query ADC tables; per-partition top-R buffers
      val tables = new Array[Array[Double]](qs.length)
      implicit val ord: Ordering[(Double, Long)] =
        Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, Ordering.Long)
      val bufs = Array.fill(qs.length)(
        scala.collection.mutable.SortedSet.empty[(Double, Long)])
      rows.foreach { r =>
        val q = qIdx(r.getLong(0))
        if (tables(q) == null) {
          val qv = qs(q)._2
          val t = new Array[Double](m * cb.length)
          var j = 0
          while (j < m) {
            val off = j * dsub
            var c = 0
            while (c < cb.length) {
              val cw = cb(c)
              var s = 0.0
              var d = 0
              while (d < dsub) { s += qv(off + d) * cw(off + d); d += 1 }
              t(j * cb.length + c) = s
              c += 1
            }
            j += 1
          }
          tables(q) = t
        }
        val t = tables(q)
        val nid = r.getLong(1)
        val nn = r.getDouble(2)
        val codes = r.getSeq[Int](3)
        var s = 0.0
        var j = 0
        while (j < m) { s += t(j * cb.length + codes(j)); j += 1 }
        val adc = BigDecimal(s / (qs(q)._3 * nn))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val b = bufs(q)
        if (b.size < rTop) b += ((adc, nid))
        else if (ord.lt((adc, nid), b.last)) { b -= b.last; b += ((adc, nid)) }
      }
      bufs.iterator.zipWithIndex.flatMap { case (b, q) =>
        b.iterator.map { case (adc, nid) => Row(qs(q)._1, nid, adc) }
      }
    }(enc)
    val wR = Window.partitionBy("qid").orderBy(col("adc").desc, col("nid").asc)
    val top = partTop.withColumn("_r", row_number().over(wR))
      .filter(col("_r") <= rTop).select("qid", "nid")
    val pairs = top
      .join(broadcast(qBase), "qid")
      .join(index.vectors.select("nid", "nv", "nn"), "nid")
      .select(col("qid"), col("nid"), col("qv"), col("nv"), col("qn"), col("nn"))
    val scored = VectorOps.scorePairs(pairs)
      .withColumn("sim", round(col("sim"), 6))
    VectorOps.topKPerKey(scored, "qid", k)
  }

  /** Approximate top-k by ADC over the code table, exact rerank of the
    * `k*refine` global survivors. Output (qid, nid, sim, rank 1..k) —
    * exact cosine rounded to 6, like every ANN operator here.
    *
    * ADC score = round( (Σ_j table_j[code_j]) / (qn·nn), 6 ) — the
    * approximate cosine of the query against the RECONSTRUCTED vector,
    * where `table_j[c] = <q_subj, codeword-c_subj>` is the per-query
    * distance table (computed once per partition per query: Q·ksub·dim
    * flops). Self-matches are excluded.
    */
  def pqTopK(queries: DataFrame, qid: String, qvec: String,
             index: PqIndex, k: Int, refine: Int = 4): DataFrame = {
    val m = index.m
    val book = index.codebook
    val dim = book.headOption.map(_.length).getOrElse(0)
    val dsub = if (m == 0) 0 else dim / m
    // same no-persist stance as [[ivfPqTopK]]: collect the broadcast-sized
    // queries once and rebuild the tiny frame for the rerank join
    val spark = queries.sparkSession
    val qRows: Array[(Long, Array[Double], Double)] = queries
      .select(col(qid).cast("long").as("qid"),
        transform(col(qvec), x => x.cast("double")).as("qv"))
      .withColumn("qn", VectorOps.norm(col("qv")))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    import spark.implicits._
    val qBase = qRows.toSeq.map { case (i, v, n) => (i, v.toSeq, n) }
      .toDF("qid", "qv", "qn")
    val sc = spark.sparkContext
    val bcQ = sc.broadcast(qRows)
    val bcB = sc.broadcast(book)
    val rTop = k * refine
    val outSchema = StructType(Seq(
      StructField("qid", LongType),
      StructField("nid", LongType),
      StructField("adc", DoubleType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    // one narrow pass over CODES; per-partition top-R per query via a
    // bounded ordered buffer — two-phase top-k, so the global cut below
    // is partition-independent
    val partTop = index.codes.select("nid", "nn", "codes").mapPartitions { rows =>
      val qs = bcQ.value
      val cb = bcB.value
      // per-query tables t(q)(j*K + c) = <q_subj, codeword-c_subj>
      val tables = qs.map { case (_, qv, _) =>
        val t = new Array[Double](m * cb.length)
        var j = 0
        while (j < m) {
          val off = j * dsub
          var c = 0
          while (c < cb.length) {
            val cw = cb(c)
            var s = 0.0
            var d = 0
            while (d < dsub) { s += qv(off + d) * cw(off + d); d += 1 }
            t(j * cb.length + c) = s
            c += 1
          }
          j += 1
        }
        t
      }
      // ordered buffers: worst element evicted on overflow; order by
      // (adc desc, nid asc) so ties are deterministic
      implicit val ord: Ordering[(Double, Long)] =
        Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, Ordering.Long)
      val bufs = Array.fill(qs.length)(
        scala.collection.mutable.SortedSet.empty[(Double, Long)])
      rows.foreach { r =>
        val nid = r.getLong(0)
        val nn = r.getDouble(1)
        val codes = r.getSeq[Int](2)
        var q = 0
        while (q < qs.length) {
          if (qs(q)._1 != nid) {
            val t = tables(q)
            var s = 0.0
            var j = 0
            while (j < m) { s += t(j * cb.length + codes(j)); j += 1 }
            val adc = BigDecimal(s / (qs(q)._3 * nn))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
            val b = bufs(q)
            if (b.size < rTop) b += ((adc, nid))
            else if (ord.lt((adc, nid), b.last)) { b -= b.last; b += ((adc, nid)) }
          }
          q += 1
        }
      }
      bufs.iterator.zipWithIndex.flatMap { case (b, q) =>
        b.iterator.map { case (adc, nid) => Row(qs(q)._1, nid, adc) }
      }
    }(enc)
    val wR = Window.partitionBy("qid").orderBy(col("adc").desc, col("nid").asc)
    val cand = partTop.withColumn("_r", row_number().over(wR))
      .filter(col("_r") <= rTop).select("qid", "nid")
    val pairs = cand
      .join(broadcast(qBase), "qid")
      .join(index.vectors, "nid")
      .select(col("qid"), col("nid"), col("qv"), col("nv"), col("qn"), col("nn"))
    val scored = VectorOps.scorePairs(pairs)
      .withColumn("sim", round(col("sim"), 6))
    VectorOps.topKPerKey(scored, "qid", k)
  }
}
