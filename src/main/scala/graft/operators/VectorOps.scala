package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.util.Random

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *    Scale-safe *for a bounded query set*: the query side is broadcast, the
  *    corpus is scanned once, and top-k is reduced in two phases (partial
  *    per input partition, then final), so no single task ever sees the
  *    whole corpus.
  *  - [[lshTopK]]: random-hyperplane LSH (SimHash for angles). Each vector
  *    gets `tables` bucket ids of `bits` sign-bits each; candidates are
  *    vectors sharing a bucket in any table; exact cosine is computed only
  *    within candidates. P(bucket match | angle θ) = (1 - θ/π)^bits per
  *    table. At corpus size N choose bits ≈ log2(N / targetBucket) so
  *    buckets stay O(targetBucket) — the all-pairs product never
  *    materializes.
  *
  * All arithmetic runs in doubles in array order, so results are bit-stable
  * and reproducible against external oracles.
  */
object VectorOps {

  /** Cosine similarity of two double-array columns (dot / norms). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Cosine with precomputed norms — per-pair work drops to one dot product
    * (norms are per-vector and belong on the base frame, not in the pair
    * loop).
    */
  def cosinePrenormed(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Native codegen'd kernels ([[graft.functions.DotProduct]] /
    * [[graft.functions.NormL2]]): a primitive loop over the unsafe array,
    * fused into the surrounding WholeStageCodegen span. Bit-identical to
    * the HOF forms below (left-to-right double accumulation — locked by
    * VectorExpressionsSpec), which stay as their differential oracles:
    * `aggregate`/`zip_with` are CodegenFallback, costing an interpreted
    * lambda call per element plus a materialized intermediate array per
    * pair.
    */
  def dot(x: Column, y: Column): Column = graft.functions.VectorExpressions.vecDot(x, y)

  def norm(x: Column): Column = graft.functions.VectorExpressions.vecNorm(x)

  /** HOF reference formulations — test oracles for the native kernels.
    * The accumulator add is written `v + acc` ON PURPOSE: IEEE-754 addition
    * is commutative, so values stay bit-identical to the canonical
    * `acc + v` form, but [[graft.functions.RewriteVectorHofs]] (which
    * rewrites the canonical shape to the kernels) leaves these untouched —
    * otherwise every differential test would compare the kernel to itself.
    */
  private[graft] def dotHof(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => v + acc)

  private[graft] def normHof(x: Column): Column =
    sqrt(aggregate(x, lit(0.0), (acc, v) => v * v + acc))

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Exact top-k neighbors for each query vector.
    * @param queries (qid, qvec float array) — must be broadcast-sized
    * @param corpus  (id, vec float array)
    * Output: (qid, id, sim, rank), rank 1..k by (sim desc, id).
    */
  def bruteForceTopK(queries: DataFrame, qid: String, qvec: String,
                     corpus: DataFrame, id: String, vec: String,
                     k: Int): DataFrame = {
    val q = queries.select(col(qid).as("qid"), asDouble(col(qvec)).as("qv"))
      .withColumn("qn", norm(col("qv")))
    // the broadcast join is a narrow stage: per-candidate cosine runs on
    // the corpus scan's partitioning, so a single-split corpus must spread
    val c = Spread(corpus).select(col(id).as("nid"), asDouble(col(vec)).as("nv"))
      .withColumn("nn", norm(col("nv")))
    val pairs = c.join(broadcast(q), col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), col("qv"), col("nv"), col("qn"), col("nn"))
    val scored = scorePairs(pairs)
      .withColumn("sim", round(col("sim"), 6))
    topKPerKey(scored, "qid", k)
  }

  /** Two-phase per-key top-k: rank within (key, input partition) first so
    * the exchange never funnels a key's whole corpus through one task.
    */
  def topKPerKey(scored: DataFrame, key: String, k: Int): DataFrame = {
    val w1 = Window.partitionBy(col(key), col("_pid"))
      .orderBy(col("sim").desc, col("nid"))
    val cand = scored.withColumn("_pid", spark_partition_id())
      .withColumn("_r1", row_number().over(w1))
      .filter(col("_r1") <= k)
      .drop("_pid", "_r1")
    val w = Window.partitionBy(col(key)).orderBy(col("sim").desc, col("nid"))
    cand.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic random hyperplanes: tables x bits planes of dim
    * components, seeded — identical across executors and runs.
    */
  def hyperplanes(tables: Int, bits: Int, dim: Int, seed: Long = 42L): Seq[Seq[Array[Double]]] = {
    val rnd = new Random(seed)
    Seq.fill(tables)(Seq.fill(bits)(Array.fill(dim)(rnd.nextGaussian())))
  }

  /** Bucket ids per table: bit b set iff dot(vec, plane_tb) >= 0.
    *
    * Column-level reference formulation. Do NOT use in pipelines: the
    * tables x bits x dim literal arrays inline ~8k literal nodes into the
    * plan — Catalyst planning plus 1.5 MiB codegen units dominated the
    * runtime. [[bucketRows]] computes the same buckets in one
    * per-partition loop over a broadcast plane matrix; this stays as its
    * test oracle.
    */
  def lshBuckets(vec: Column, planes: Seq[Seq[Array[Double]]]): Column = {
    val perTable = planes.zipWithIndex.map { case (tablePlanes, t) =>
      val bucket = tablePlanes.zipWithIndex.map { case (plane, b) =>
        val planeCol = array(plane.map(lit): _*)
        val dot = aggregate(zip_with(vec, planeCol, (x, p) => x * p),
          lit(0.0), (acc, v) => acc + v)
        when(dot >= 0, lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ + _)
      struct(lit(t).as("table"), bucket.as("bucket"))
    }
    array(perTable: _*)
  }

  /** (id, bk struct<table,bucket>) rows — all tables x bits plane dot
    * products in one vectorized per-partition loop over a broadcast plane
    * matrix. Dot products accumulate left-to-right like the Column form, so
    * buckets are bit-identical to [[lshBuckets]]. The rare justified exit
    * from Catalyst: the planes are per-query constants, and inlining them
    * as literals broke planning, not semantics.
    *
    * @param df frame holding `idName` and a pre-cast `array<double>`
    *           column `vecName`
    */
  def bucketRows(df: DataFrame, idName: String, vecName: String,
                 planes: Seq[Seq[Array[Double]]]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val tables = planes.size
    val bits = planes.head.size
    val dim = planes.head.head.length
    val flat = new Array[Double](tables * bits * dim)
    for (t <- 0 until tables; b <- 0 until bits; i <- 0 until dim)
      flat((t * bits + b) * dim + i) = planes(t)(b)(i)
    val bc = df.sparkSession.sparkContext.broadcast(flat)
    val in = df.select(col(idName), col(vecName))
    val idField = in.schema.fields.head
    val outSchema = StructType(Seq(idField,
      StructField("bk", StructType(Seq(
        StructField("table", IntegerType, nullable = false),
        StructField("bucket", LongType, nullable = false))))))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    in.mapPartitions { rows =>
      val p = bc.value
      rows.flatMap { r =>
        val id = r.get(0)
        val v = r.getSeq[Double](1).toArray
        (0 until tables).iterator.map { t =>
          var bucket = 0L
          var b = 0
          while (b < bits) {
            val off = (t * bits + b) * dim
            var s = 0.0
            var i = 0
            while (i < dim) { s += v(i) * p(off + i); i += 1 }
            if (s >= 0) bucket |= (1L << b)
            b += 1
          }
          Row(id, Row(t, bucket))
        }
      }
    }(enc)
  }

  /** Candidate-pair cosine, fully inside whole-stage codegen.
    *
    * Input: (keyA, keyB, va, vb, na, nb) with `array<double>` vectors and
    * precomputed norms; output (keyA, keyB, sim) with sim = dot/(na·nb),
    * UNROUNDED — callers round at the Column layer so rounding semantics
    * (HALF_UP, like the SQL oracles) stay identical to the HOF form. The
    * native [[graft.functions.DotProduct]] accumulates left-to-right like
    * `aggregate(zip_with(...))`, so sims are bit-identical to
    * [[cosinePrenormed]] — and unlike the r8 `mapPartitions` loop this
    * shape keeps scan -> join -> score -> filter one fused codegen stage
    * (no InternalRow -> Row encoder boundary boxing every element through
    * `Seq[Double]`). The loop form survives as [[scorePairsLoop]], the
    * differential oracle.
    */
  def scorePairs(pairs: DataFrame): DataFrame = {
    val fs = pairs.schema.fields
    pairs.select(col(fs(0).name), col(fs(1).name),
      (dot(col(fs(2).name), col(fs(3).name)) /
        (col(fs(4).name) * col(fs(5).name))).as("sim"))
  }

  /** r8 per-partition loop formulation — test oracle for [[scorePairs]]. */
  private[graft] def scorePairsLoop(pairs: DataFrame): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val fs = pairs.schema.fields
    val outSchema = StructType(Seq(fs(0), fs(1), StructField("sim", DoubleType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    pairs.mapPartitions { rows =>
      rows.map { r =>
        val va = r.getSeq[Double](2)
        val vb = r.getSeq[Double](3)
        val n = va.length
        var s = 0.0
        var i = 0
        while (i < n) { s += va(i) * vb(i); i += 1 }
        Row(r.get(0), r.get(1), s / (r.getDouble(4) * r.getDouble(5)))
      }
    }(enc)
  }

  /** Approximate top-k: candidates from shared LSH buckets, exact cosine on
    * candidates only.
    */
  def lshTopK(queries: DataFrame, qid: String, qvec: String,
              corpus: DataFrame, id: String, vec: String,
              k: Int, tables: Int = 32, bits: Int = 4, dim: Int = 64): DataFrame = {
    val planes = hyperplanes(tables, bits, dim)
    // candidate dedup runs on bare id pairs — vector arrays join back in
    // afterwards from the cached bases, so neither the bucket join nor the
    // distinct shuffles 64-dim payloads. NOT eagerly filled (measured):
    // the racing consumers' duplicated narrow pass overlaps otherwise idle
    // cores here — serializing it read +0.3-0.5 s on the sf0.1 bench.
    val qBase = queries.select(col(qid).as("qid"), asDouble(col(qvec)).as("qv"))
      .withColumn("qn", norm(col("qv")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cBase = Spread(corpus).select(col(id).as("nid"), asDouble(col(vec)).as("nv"))
      .withColumn("nn", norm(col("nv")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val q = bucketRows(qBase, "qid", "qv", planes)
    val c = bucketRows(cBase, "nid", "nv", planes)
    val cand = c.as("c").join(broadcast(q).as("q"),
        col("q.bk") === col("c.bk") && col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"))
      .distinct()
    val pairs = cand
      .join(broadcast(qBase), "qid")
      .join(cBase, "nid")
      .select(col("qid"), col("nid"), col("qv"), col("nv"), col("qn"), col("nn"))
    val scored = scorePairs(pairs)
      .withColumn("sim", round(col("sim"), 6))
    topKPerKey(scored, "qid", k)
  }

  /** Centroid-sampling stride for [[ivfTopK]]: targets ~sqrt(N) centroids
    * (stride = ceil(sqrt(N)) ⇒ N/stride ≈ sqrt(N)) with a hard centroid cap
    * so the driver collect and the broadcast stay bounded at any corpus
    * size. `minStride` floors the stride so tiny corpora keep useful list
    * sizes. Mirrored verbatim by the `ann_ivf` DuckDB oracle SQL —
    * change both together or the hash check breaks.
    */
  def ivfStride(n: Long, minStride: Int = 25, maxCentroids: Int = 1 << 16): Long =
    math.max(minStride.toLong,
      math.max(math.ceil(math.sqrt(n.toDouble)).toLong,
        math.ceil(n.toDouble / maxCentroids).toLong))

  /** Byte-bounded centroid budget: the quantizer collects
    * ([[ivfTopK]]/[[semanticDuplicates]] sampled centroids,
    * [[kmeansCentroids]] init + recentered means) are capped in BYTES, not
    * rows — `maxCentroids` rows are ~35 MB at dim 64 but ~500 MB at dim
    * 1024, which would sink the driver and every executor the matrix
    * broadcasts to. A collected row costs ~`8*dim` for the doubles plus
    * ~64 B of id/norm/object headers; the budget keeps
    * rows*perRow <= `maxBytes` (default 64 MB — a broadcast-join build-side
    * budget), floored at 256 rows so tiny budgets still quantize.
    *
    * Recall trade when the byte cap binds: fewer cells means longer
    * inverted lists, so IVF probes scan a larger corpus fraction
    * (`nprobe / #cells` grows) and SemDedup cells lean harder on the
    * `clusterCap` sub-split — throughput degrades smoothly; no cliff.
    */
  def centroidBudget(dim: Int, maxCentroids: Int = 1 << 16,
                     maxBytes: Long = 64L << 20): Int = {
    val perRow = 8L * math.max(1, dim) + 64L
    math.max(256L, math.min(maxCentroids.toLong, maxBytes / perRow)).toInt
  }

  /** Dimension of the vector column (from one row; 0 on an empty frame). */
  private[operators] def probeDim(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol))).head(1).headOption.map(_.getInt(0)).getOrElse(0)

  /** Lloyd k-means over unit-direction vectors — the optional trainer for
    * [[ivfTopK]]'s coarse quantizer (spherical k-means: cosine assignment,
    * mean recentering). Deterministic: initial centroids are the k rows
    * with the smallest `xxhash64(id)` — a seeded uniform sample that works
    * on sparse or hashed id spaces (an id-modulo stride can yield far fewer
    * than k rows there) and excludes zero-norm vectors, whose cosine
    * against anything is NaN and would poison every assignment. The
    * hash-ordered take is a `TakeOrderedAndProject` (per-partition top-k +
    * merge), not a global sort. Iterations are fixed-count.
    *
    * Scale shape per iteration: assignment is the same broadcast-matrix
    * per-partition pass the search path uses (no corpus shuffle); the
    * recentering explodes assigned vectors to (cid, pos, value) and
    * mean-aggregates — one shuffle carrying scalar triples, map-side
    * partial. k is bounded by the [[ivfStride]] budget, so the collected
    * centroid matrix stays driver-safe. Returns (cid, vector, norm)
    * triples ready for [[ivfTopKWith]].
    */
  def kmeansCentroids(corpus: DataFrame, id: String, vec: String,
                      k: Int, iters: Int = 2,
                      maxCentroidBytes: Long = 64L << 20): Array[(Long, Array[Double], Double)] = {
    import org.apache.spark.sql.Row
    val base = Spread(corpus).select(col(id).cast("long").as("nid"),
        asDouble(col(vec)).as("nv"))
      .withColumn("nn", norm(col("nv")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // byte-bound k like the sampled-quantizer collects: the init collect
    // AND every iteration's recentered-means collect are k rows of dim
    // doubles
    val kEff = math.min(k, centroidBudget(probeDim(base, "nv"), k, maxCentroidBytes))
    var cents: Array[(Long, Array[Double], Double)] =
      base.filter(col("nn") > 0)
        .orderBy(xxhash64(col("nid")), col("nid")).limit(kEff).collect()
        .zipWithIndex
        .map { case (r, i) => (i.toLong, r.getSeq[Double](1).toArray, r.getDouble(2)) }
    var it = 0
    while (it < iters && cents.nonEmpty) {
      val assigned = assignCentroids(base, "nid", "nv", "nn", cents, 1)
        .join(base, "nid")
      val means = assigned
        .select(col("cid"), posexplode(col("nv")).as(Seq("pos", "x")))
        .groupBy("cid", "pos").agg(avg(col("x")).as("m"))
        .groupBy("cid")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("ms"))
        .collect()
        .map { r =>
          val arr = r.getSeq[Row](1).map(_.getDouble(1)).toArray
          var s = 0.0
          arr.foreach(x => s += x * x)
          (r.getLong(0), arr, math.sqrt(s))
        }
        .filter(_._3 > 0) // a cluster that lost all members drops out
        .sortBy(_._1)
      cents = means
      it += 1
    }
    base.unpersist()
    cents
  }

  /** [[ivfTopK]] with a caller-supplied centroid table (e.g. from
    * [[kmeansCentroids]]) — the swappable-quantizer search path. Centroid
    * ids must be distinct; assignment and probing are identical to the
    * systematic-sample variant.
    */
  def ivfTopKWith(queries: DataFrame, qid: String, qvec: String,
                  corpus: DataFrame, id: String, vec: String,
                  cents: Array[(Long, Array[Double], Double)],
                  k: Int, nprobe: Int = 4): DataFrame = {
    require(cents.nonEmpty, "empty centroid table")
    val cBase = Spread(corpus).select(col(id).as("nid"), asDouble(col(vec)).as("nv"))
      .withColumn("nn", norm(col("nv")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val qBase = queries.select(col(qid).as("qid"), asDouble(col(qvec)).as("qv"))
      .withColumn("qn", norm(col("qv")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ivfSearch(qBase, cBase, cents, k, nprobe)
  }

  /** Shared IVF search: inverted-list scan of pre-normed (qid,qv,qn) /
    * (nid,nv,nn) bases against a broadcast centroid table. Probes are
    * broadcast; each candidate (qid, nid) appears once because a corpus
    * vector lives in exactly one list.
    */
  private def ivfSearch(qBase: DataFrame, cBase: DataFrame,
                        cents: Array[(Long, Array[Double], Double)],
                        k: Int, nprobe: Int): DataFrame = {
    val assignN = assignCentroids(cBase, "nid", "nv", "nn", cents, 1)
    val probesQ = assignCentroids(qBase, "qid", "qv", "qn", cents, nprobe)
    val pairs = assignN.join(broadcast(probesQ),
        assignN("cid") === probesQ("cid") && col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"))
      .join(broadcast(qBase), "qid")
      .join(cBase, "nid")
      .select(col("qid"), col("nid"), col("qv"), col("nv"), col("qn"), col("nn"))
    val scored = scorePairs(pairs)
      .withColumn("sim", round(col("sim"), 6))
    topKPerKey(scored, "qid", k)
  }

  /** IVF (inverted-file) approximate top-k — the coarse-quantizer scale
    * path alongside [[lshTopK]].
    *
    * Centroids are a deterministic systematic sample of the corpus (every
    * `stride`-th id, stride derived by [[ivfStride]]) rather than trained
    * k-means: no training pass, fully reproducible by an external SQL
    * oracle — swap in [[kmeansCentroids]] via [[ivfTopKWith]] when a
    * trained quantizer pays for itself. Every corpus vector is
    * assigned to its max-cosine centroid (tie: smallest centroid id); a
    * query probes its `nprobe` nearest centroids and scans exactly those
    * inverted lists with exact cosine.
    *
    * Requires numeric (long-castable) corpus ids — the systematic sample is
    * `id % stride == 0`. If that sample is empty (e.g. sparse ids none of
    * which divide the stride), falls back to [[bruteForceTopK]] rather than
    * silently returning nothing.
    *
    * Scale shape: the centroid matrix is broadcast and capped at
    * `maxCentroids` rows (~sqrt(N) until the cap binds); assignment is one
    * narrow per-partition pass over the corpus (argmax in a tight loop, no
    * shuffle); the probe side is tiny and broadcast, so candidate
    * generation is one broadcast join on the centroid id — the corpus
    * shuffles zero times end-to-end. `nprobe / #centroids` bounds the
    * scanned corpus fraction.
    */
  def ivfTopK(queries: DataFrame, qid: String, qvec: String,
              corpus: DataFrame, id: String, vec: String,
              k: Int, minStride: Int = 25, nprobe: Int = 4,
              maxCentroids: Int = 1 << 16,
              maxCentroidBytes: Long = 64L << 20): DataFrame = {
    val cBase = Spread(corpus).select(col(id).as("nid"), asDouble(col(vec)).as("nv"))
      .withColumn("nn", norm(col("nv")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val qBase = queries.select(col(qid).as("qid"), asDouble(col(qvec)).as("qv"))
      .withColumn("qn", norm(col("qv")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stride = ivfStride(cBase.count(), minStride,
      centroidBudget(probeDim(cBase, "nv"), maxCentroids, maxCentroidBytes))
    // deterministic coarse centroids; the collect is bounded: ~sqrt(N) rows
    // until maxCentroids caps it — the same budget a broadcast-join build
    // side gets
    val cents: Array[(Long, Array[Double], Double)] =
      cBase.filter(col("nid") % stride === 0)
        .orderBy("nid")
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    if (cents.isEmpty)
      return bruteForceTopK(queries, qid, qvec, corpus, id, vec, k)
    ivfSearch(qBase, cBase, cents, k, nprobe)
  }

  /** (id, cid) rows: each vector's `take` max-cosine centroids, ordered by
    * (cosine desc, centroid id asc), computed in one per-partition pass over
    * the broadcast centroid matrix. Cosines accumulate left-to-right like
    * the Column form, so ranking ties resolve identically to a SQL oracle.
    */
  private[operators] def assignCentroids(df: DataFrame, idName: String, vecName: String,
                              normName: String,
                              cents: Array[(Long, Array[Double], Double)],
                              take: Int,
                              carryNorm: Boolean = false): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val bc = df.sparkSession.sparkContext.broadcast(cents)
    val in = df.select(col(idName), col(vecName), col(normName))
    val idField = in.schema.fields.head
    val outSchema = StructType(
      Seq(idField, StructField("cid", LongType, nullable = false)) ++
        (if (carryNorm) Seq(StructField(normName, DoubleType, nullable = false))
         else Nil))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    in.mapPartitions { rows =>
      val cs = bc.value
      rows.flatMap { r =>
        val v = r.getSeq[Double](1).toArray
        val nv = r.getDouble(2)
        val sims = cs.map { case (cid, cv, cn) =>
          var s = 0.0
          var i = 0
          while (i < v.length) { s += v(i) * cv(i); i += 1 }
          (cid, s / (nv * cn))
        }
        sims.sortBy { case (cid, s) => (-s, cid) }.take(take)
          .map { case (cid, _) =>
            if (carryNorm) Row(r.get(0), cid, nv) else Row(r.get(0), cid)
          }
      }
    }(enc)
  }

  /** Corpus cartography: assign every vector to its nearest coarse-quantizer
    * cell and roll the corpus up per cell — the map an embedding-curation
    * pass reads before deciding where to prune, rebalance, or sample
    * (SemDedup / DsDm-style cluster-level curation; the cells are exactly
    * [[semanticDuplicates]]'s Voronoi cells and [[ivfTopK]]'s inverted
    * lists, so the map describes what those operators will see).
    *
    * Centroids are the deterministic systematic sample ([[ivfStride]] —
    * replayable by an external SQL oracle); assignment is the same
    * broadcast-matrix narrow pass the IVF search uses (max cosine, ties to
    * the smaller centroid id), and the rollup is ONE map-side-combinable
    * aggregate on the cell id — the corpus never shuffles a vector.
    *
    * Per-row norms enter the rollup as `floor(norm * 1e6)` integers so the
    * per-cell sum is bit-exact across engines and row orders (the text_lm
    * stance: no floating-point accumulation in a hash-checked output).
    *
    * Output: (cid, n_members, min_id, sum_norm_q6).
    */
  def clusterAssign(corpus: DataFrame, id: String, vec: String,
                    minStride: Int = 25, maxCentroids: Int = 1 << 16,
                    maxCentroidBytes: Long = 64L << 20): DataFrame = {
    val cBase = Spread(corpus).select(col(id).as("nid"), asDouble(col(vec)).as("nv"))
      .withColumn("nn", norm(col("nv")))
    // The cache lives ONLY across the two planning reads (count + centroid
    // collect) and is released before the output is built: the rollup scans
    // cBase exactly once, so caching it for the output would trade one
    // narrow recompute for a cached RDD leaked for the session's lifetime
    // (the ProductQuantization qBase leak class).
    cBase.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (stride, cents) =
      try {
        val st = ivfStride(cBase.count(), minStride,
          centroidBudget(probeDim(cBase, "nv"), maxCentroids, maxCentroidBytes))
        val cs: Array[(Long, Array[Double], Double)] =
          cBase.filter(col("nid") % st === 0)
            .orderBy("nid")
            .collect()
            .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
        (st, cs)
      } finally cBase.unpersist()
    require(cents.nonEmpty,
      s"clusterAssign: empty systematic sample (stride $stride) — " +
        "ids must be long-castable with some multiple of the stride present")
    val out = assignCentroids(cBase, "nid", "nv", "nn", cents, 1, carryNorm = true)
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_members"),
        min(col("nid")).as("min_id"),
        sum(floor(col("nn") * 1e6).cast("long")).as("sum_norm_q6"))
    out
  }

  /** Embedding near-duplicate pairs: cosine >= threshold, candidates via
    * shared LSH buckets only (never all pairs).
    *
    * Bucket skew is capped the same way the text dedups cap it
    * ([[TextDedup.cappedPairs]]'s census shape): a per-bucket census runs
    * first (map-side partial agg, skew-safe), buckets above `bucketCap`
    * members are routed to an exact-signature fallback — grouping by the
    * FULL LSH signature (all `tables` buckets), so a boilerplate cluster of
    * identical embeddings collapses to one group (whose pairwise output is
    * the contract) while a degenerate single-table hot bucket sub-splits by
    * every other table's bits. No bucket ever enters the quadratic
    * expansion above the cap.
    *
    * Verification is IN-GROUP ([[verifyGroups]]): members carry their
    * vector into the (capped) bucket group once, pairs score and filter
    * inside the task, and only surviving (id_a, id_b, sim) rows exist as
    * data — candidate pairs never shuffle, with or without payload.
    */
  /** @param autoBits when true, widen `bits` to
    *   `ceil(log2(N / (bucketCap/2)))` (clamped to [bits, 16]) so the
    *   expected bucket population N/2^bits stays ~bucketCap/2 as the corpus
    *   grows. With fixed bits every bucket eventually exceeds the census
    *   cap and candidates collapse to exact-signature groups — a silent
    *   recall cliff (the volume ladder shows fixed bits=4 finding 0 planted
    *   pairs at 10x). Per-table collision probability for a true pair is
    *   `(1-θ/π)^bits`, so widening suits HIGH thresholds (sim >= ~0.8 keeps
    *   32-table recall >= 0.99 up to bits = 16); low-threshold sweeps should
    *   raise `tables` alongside. Off by default: bits is part of the
    *   operator's oracle-checked contract.
    */
  def embeddingDuplicates(corpus: DataFrame, id: String, vec: String,
                          threshold: Double,
                          tables: Int = 32, bits: Int = 4, dim: Int = 64,
                          bucketCap: Int = 200,
                          autoBits: Boolean = false): DataFrame = {
    // cache: the bucket computation (tables x bits dot products) would
    // otherwise run once per consumer (census, heavy-id path, light path).
    // Ids are long-cast for the in-group verifier (numeric ids, like the
    // other vector operators).
    val base = Spread(corpus).select(col(id).cast("long").as("id"),
        asDouble(col(vec)).as("v"))
      .withColumn("nrm", norm(col("v")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bitsEff =
      if (!autoBits) bits
      else {
        val n = base.count().toDouble
        val target = math.max(1.0, bucketCap / 2.0)
        math.min(16, math.max(bits,
          math.ceil(math.log(n / target) / math.log(2.0)).toInt))
      }
    val planes = hyperplanes(tables, bitsEff, dim)
    val keyed = bucketRows(base, "id", "v", planes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // eager fill (also fills base in the same pass): census, light and
    // heavy paths race this cache under AQE otherwise
    keyed.count()
    val heavyBuckets = keyed.groupBy("bk").count()
      .filter(col("count") > bucketCap).select("bk")
    // over-cap buckets: exact grouping by full signature (group sizes are
    // bounded by true-duplicate multiplicity — the pair contract is
    // inherently quadratic in an exact-duplicate group)
    val exactKey = keyed.groupBy("id")
      .agg(xxhash64(sort_array(collect_list(
        struct(col("bk.table"), col("bk.bucket"))))).as("k"))
    val heavyMembers = keyed.join(broadcast(heavyBuckets), Seq("bk"))
      .select("id").distinct()
      .join(exactKey, "id").join(base, "id")
      .groupBy("k").agg(collect_list(struct(col("id"), col("v"), col("nrm"))).as("ms"))
      .filter(size(col("ms")) > 1)
    // sub-cap buckets: vectors ride the banding pass (narrow — no join),
    // and verification happens INSIDE each bucket group. The alternative —
    // distinct candidate ids, then joining both vectors onto every pair —
    // shuffles pairs x vector payload: at 200k vectors with ~100-member
    // buckets that is ~3e8 pairs x ~1 KiB, hundreds of GB; this shape
    // shuffles members x vector once (N x tables rows) and the pair loop
    // never leaves the bucket's task.
    val lightMembers = bucketRowsCarry(base, planes)
      .join(broadcast(heavyBuckets), Seq("bk"), "left_anti")
      .groupBy("bk").agg(collect_list(struct(col("id"), col("v"), col("nrm"))).as("ms"))
      .filter(size(col("ms")) > 1)
    // a pair can surface from a sub-cap bucket AND the heavy fallback (or
    // several buckets); sims are bit-identical everywhere, keep one
    verifyGroups(lightMembers.select("ms").union(heavyMembers.select("ms")),
        threshold)
      .dropDuplicates("id_a", "id_b")
  }

  /** The persistent-corpus form of [[embeddingDuplicates]] — the embedding
    * counterpart of [[TextDedup.MinhashIndex]]: `buckets` holds one
    * (id, bk) row per (vector, table), `vectors` the unit ingredients
    * (id, v, nrm) plus the full-signature key `k` (xxhash64 of the sorted
    * (table, bucket) list — the SAME key [[embeddingDuplicates]]'s over-cap
    * fallback groups by, so incremental ≡ batch at the cap boundary).
    */
  final case class EmbeddingIndex(buckets: DataFrame, vectors: DataFrame) {
    def release(): Unit = {
      buckets.unpersist(blocking = false)
      vectors.unpersist(blocking = false)
    }
  }

  /** Build the [[EmbeddingIndex]] — ONE bucketing pass over the corpus.
    * Same hyperplanes/bit math as [[embeddingDuplicates]] (seeded,
    * deterministic), so probes find exactly the candidates a full
    * recomputation would.
    */
  def embeddingIndex(corpus: DataFrame, id: String, vec: String,
                     tables: Int = 32, bits: Int = 4,
                     dim: Int = 64): EmbeddingIndex = {
    val base = Spread(corpus).select(col(id).cast("long").as("id"),
        asDouble(col(vec)).as("v"))
      .withColumn("nrm", norm(col("v")))
    val buckets = bucketRows(base, "id", "v", hyperplanes(tables, bits, dim))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sigk = buckets.groupBy("id")
      .agg(xxhash64(sort_array(collect_list(
        struct(col("bk.table"), col("bk.bucket"))))).as("k"))
    val vectors = base.join(sigk, "id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // build the index NOW: probes fan into concurrent stages that would
    // otherwise race to fill both caches, re-running the bucket pass
    vectors.count()
    EmbeddingIndex(buckets, vectors)
  }

  /** Write an [[EmbeddingIndex]] to `<path>/buckets` + `<path>/vectors` —
    * plain parquet, build once / reload per arriving batch (the
    * [[TextDedup.saveIndex]] contract).
    */
  def saveEmbeddingIndex(index: EmbeddingIndex, path: String): Unit = {
    index.buckets.write.mode("overwrite").parquet(s"$path/buckets")
    index.vectors.write.mode("overwrite").parquet(s"$path/vectors")
  }

  /** Reload an [[EmbeddingIndex]] written by [[saveEmbeddingIndex]]; probes
    * are value-identical to the in-memory index (asserted in LlmOpsSpec).
    */
  def loadEmbeddingIndex(spark: org.apache.spark.sql.SparkSession,
                         path: String): EmbeddingIndex =
    EmbeddingIndex(
      spark.read.parquet(s"$path/buckets"),
      spark.read.parquet(s"$path/vectors"))

  /** Near-duplicates of an ARRIVING batch against an indexed corpus — the
    * daily-crawl shape ([[TextDedup.minhashDuplicatesAgainst]] for
    * embeddings): the batch pays its own bucketing plus a bucket-equality
    * join against the index, and verification reads the STORED corpus
    * vectors — the corpus embedding column is never re-read. Hot buckets
    * are capped with the combined index+batch census (cap-margin parity
    * with the batch pipeline); the exact full-signature probe runs
    * unconditionally and `distinct` merges the candidate sources.
    *
    * Output: (new_id, old_id, sim >= threshold), exact cosine rounded
    * half-up to 6 like every vector operator here.
    */
  def embeddingDuplicatesAgainst(batch: DataFrame, id: String, vec: String,
                                 index: EmbeddingIndex, threshold: Double,
                                 tables: Int = 32, bits: Int = 4,
                                 dim: Int = 64,
                                 bucketCap: Int = 200): DataFrame = {
    val nb = Spread(batch).select(col(id).cast("long").as("id"),
        asDouble(col(vec)).as("v"))
      .withColumn("nrm", norm(col("v")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nbk = bucketRows(nb, "id", "v", hyperplanes(tables, bits, dim))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    nbk.count() // eager fill (fills nb too) — probe branches race the cache
    val nsig = nbk.groupBy("id")
      .agg(xxhash64(sort_array(collect_list(
        struct(col("bk.table"), col("bk.bucket"))))).as("k"))
    val census = index.buckets.select("bk").union(nbk.select("bk"))
      .groupBy(col("bk")).agg(count(lit(1)).as("_n"))
    val light = index.buckets.join(census.filter(col("_n") <= bucketCap), "bk")
    val candLight = nbk
      .select(col("id").as("new_id"), col("bk"))
      .join(light.select(col("id").as("old_id"), col("bk")), "bk")
      .select("new_id", "old_id")
    val candExact = nsig.select(col("id").as("new_id"), col("k"))
      .join(index.vectors.select(col("id").as("old_id"), col("k")), "k")
      .select("new_id", "old_id")
    val pairs = candLight.union(candExact).distinct()
      .join(nb.select(col("id").as("new_id"), col("v").as("va"),
        col("nrm").as("na")), "new_id")
      .join(index.vectors.select(col("id").as("old_id"), col("v").as("vb"),
        col("nrm").as("nb")), "old_id")
      .select(col("new_id"), col("old_id"), col("va"), col("vb"),
        col("na"), col("nb"))
    scorePairs(pairs)
      .withColumn("sim", round(col("sim"), 6))
      .filter(col("sim") >= threshold)
      .select(col("new_id"), col("old_id"), col("sim"))
  }

  /** [[bucketRows]] carrying the vector and norm through the banding pass:
    * (bk, id, v, nrm) per table — used when verification happens in-bucket
    * so vectors never join onto candidate pairs.
    */
  private def bucketRowsCarry(df: DataFrame,
                              planes: Seq[Seq[Array[Double]]]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val tables = planes.size
    val bits = planes.head.size
    val dim = planes.head.head.length
    val flat = new Array[Double](tables * bits * dim)
    for (t <- 0 until tables; b <- 0 until bits; i <- 0 until dim)
      flat((t * bits + b) * dim + i) = planes(t)(b)(i)
    val bc = df.sparkSession.sparkContext.broadcast(flat)
    val in = df.select(col("id"), col("v"), col("nrm"))
    val outSchema = StructType(Seq(
      StructField("bk", StructType(Seq(
        StructField("table", IntegerType, nullable = false),
        StructField("bucket", LongType, nullable = false)))),
      in.schema.fields(0), in.schema.fields(1), in.schema.fields(2)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    in.mapPartitions { rows =>
      val p = bc.value
      rows.flatMap { r =>
        val v = r.getSeq[Double](1).toArray
        (0 until tables).iterator.map { t =>
          var bucket = 0L
          var b = 0
          while (b < bits) {
            val off = (t * bits + b) * dim
            var s = 0.0
            var i = 0
            while (i < dim) { s += v(i) * p(off + i); i += 1 }
            if (s >= 0) bucket |= (1L << b)
            b += 1
          }
          Row(Row(t, bucket), r.get(0), r.get(1), r.get(2))
        }
      }
    }(enc)
  }

  /** Pairwise cosine INSIDE each member group (`ms`: array of (id, v, nrm),
    * group size <= the caller's cap): members sort by id, every (i < j)
    * pair scores dot/(na*nb) with the same left-to-right loop as
    * [[scorePairs]], rounds HALF_UP to 6 like Spark's `round`, and only
    * pairs >= threshold leave the task — candidate pairs never exist as
    * rows, let alone carry vector payloads through a shuffle.
    */
  private def verifyGroups(groups: DataFrame, threshold: Double): DataFrame = {
    val spark = groups.sparkSession
    import spark.implicits._
    // spread group rows round-robin before the pair loop: a group row's
    // cost is QUADRATIC in its member count, so AQE's bytes-based
    // partition coalescing is the wrong heuristic here — it folded the
    // whole verify into one task whenever the member arrays were under the
    // advisory size (observed 2 s vs 10 s bimodal walls on the same
    // query). The explicit numPartitions pins the stage's parallelism to
    // the deployment's core count; the extra exchange moves only the
    // member arrays it was already shuffling into the groupBy.
    groups.select(col("ms"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Seq[(Long, Seq[Double], Double)]]
      .flatMap { ms0 =>
        val ms = ms0.sortBy(_._1).toArray
        val out = Seq.newBuilder[(Long, Long, Double)]
        var i = 0
        while (i < ms.length) {
          val (ida, va0, na) = ms(i)
          val va = va0.toArray
          var j = i + 1
          while (j < ms.length) {
            val (idb, vb0, nb) = ms(j)
            val vb = vb0.toArray
            var s = 0.0
            var d = 0
            while (d < va.length) { s += va(d) * vb(d); d += 1 }
            val raw = s / (na * nb)
            // HALF_UP at 6 decimals moves a value by at most 5e-7, so a
            // raw score below threshold - 1e-6 can never round up across
            // the cut — skip the BigDecimal allocation for it. In a
            // random-pair bucket ~all candidates take this branch, which
            // removes the dominant per-pair cost (one BigDecimal +
            // setScale per pair) from the quadratic loop; every score
            // that can matter is still rounded exactly as before.
            if (raw >= threshold - 1e-6) {
              val sim = BigDecimal(raw)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
              if (sim >= threshold) out += ((ida, idb, sim))
            }
            j += 1
          }
          i += 1
        }
        out.result()
      }
      .toDF("id_a", "id_b", "sim")
  }

  /** SemDedup-style cluster-scoped pruning (Abbas et al. 2023,
    * arXiv:2303.09540): coarse-cluster the corpus, then mark as prunable
    * every vector with a >= `threshold` cosine neighbor of LOWER id inside
    * its cluster. One row per pruned vector: `(drop_id, keep_id, cid, sim)`
    * where `keep_id` is its most-similar such neighbor (tie: smallest id).
    * Survivors are the ids never appearing as `drop_id`; a transitive
    * canonical per near-dup group comes from feeding the (keep, drop)
    * edges to [[Clusters.connectedComponents]].
    *
    * Differs from [[embeddingDuplicates]] in the candidate structure:
    * clusters are Voronoi cells of the [[ivfTopK]] coarse quantizer (the
    * same deterministic stride-sampled centroids, so an external SQL
    * oracle replays them), not multi-table LSH buckets — the SemDedup
    * observation is that near-duplicates land in one cell, so one
    * cluster-keyed self-join replaces `tables` bucket joins at a small
    * recall cost on cell boundaries.
    *
    * Scale shape: assignment is the [[ivfTopK]] per-partition broadcast
    * pass (zero corpus shuffles); the pairwise expansion runs per cluster
    * and is census-capped — clusters above `clusterCap` members sub-split
    * by an 8-bit LSH sign bucket appended to the group key (similar vectors
    * keep colliding; a degenerate mega-cell never goes quadratic). Members
    * carry (id, vector, norm) into their cell group in ONE shuffle and
    * verification happens inside the task ([[verifyGroups]]) — candidate
    * pairs never exist as shuffled rows.
    */
  def semanticDuplicates(corpus: DataFrame, id: String, vec: String,
                         threshold: Double, minStride: Int = 25,
                         maxCentroids: Int = 1 << 16,
                         clusterCap: Int = 2000,
                         maxCentroidBytes: Long = 64L << 20): DataFrame = {
    val base = Spread(corpus).select(col(id).cast("long").as("id"),
        asDouble(col(vec)).as("v"))
      .withColumn("nrm", norm(col("v")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stride = ivfStride(base.count(), minStride,
      centroidBudget(probeDim(base, "v"), maxCentroids, maxCentroidBytes))
    val cents: Array[(Long, Array[Double], Double)] =
      base.filter(col("id") % stride === 0)
        .orderBy("id")
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    semanticPrune(base, cents, threshold, clusterCap)
  }

  /** [[semanticDuplicates]] with a caller-supplied quantizer — pair with
    * [[kmeansCentroids]] for trained cells (the SemDedup paper's actual
    * setup: k-means cells, prune within each), identically to how
    * [[ivfTopKWith]] upgrades [[ivfTopK]].
    */
  def semanticDuplicatesWith(corpus: DataFrame, id: String, vec: String,
                             threshold: Double,
                             cents: Array[(Long, Array[Double], Double)],
                             clusterCap: Int = 2000): DataFrame = {
    val base = Spread(corpus).select(col(id).cast("long").as("id"),
        asDouble(col(vec)).as("v"))
      .withColumn("nrm", norm(col("v")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    base.count() // eager fill — semanticPrune branches race the cache
    semanticPrune(base, cents, threshold, clusterCap)
  }

  private def semanticPrune(base: DataFrame,
                            cents: Array[(Long, Array[Double], Double)],
                            threshold: Double, clusterCap: Int): DataFrame = {
    // sparse tiny id space with no stride hit: everything is one cell
    val assign =
      if (cents.isEmpty) base.select(col("id"), lit(0L).as("cid"))
      else assignCentroids(base, "id", "v", "nrm", cents, 1)
    val heavy = assign.groupBy("cid").count()
      .filter(col("count") > clusterCap).select(col("cid"))
    val subPlanes = hyperplanes(tables = 1, bits = 8,
      dim = cents.headOption.map(_._2.length).getOrElse(64)).head
    val subBucket = subPlanes.zipWithIndex.map { case (p, b) =>
      when(dot(col("v"), typedlit(p.toSeq)) >= 0, lit(1 << b)).otherwise(lit(0))
    }.reduce(_ + _)
    // one shuffle keyed on (cell, sub): members carry (id, v, nrm) into
    // their cell group and ALL pairwise work happens inside it — the
    // alternative (id-only self-join, then joining both vectors onto every
    // candidate pair) shuffles pairs x vector payload, which at sqrt(N)
    // cell sizes is ~N^1.5 x 1 KiB of traffic
    val members = assign
      .join(broadcast(heavy.withColumn("_h", lit(1))), Seq("cid"), "left")
      .join(base, "id")
      .withColumn("sub", when(col("_h").isNotNull, subBucket).otherwise(lit(0)))
      .groupBy(col("cid"), col("sub"))
      .agg(collect_list(struct(col("id"), col("v"), col("nrm"))).as("ms"))
      .filter(size(col("ms")) > 1)
    // the pair's cell id == the drop side's assignment (pairs never cross
    // cells), so recover it from `assign` after the in-group verify
    val scored = verifyGroups(members.select("ms"), threshold)
      .join(assign.select(col("id").as("id_b"), col("cid")), "id_b")
    val w = Window.partitionBy(col("id_b")).orderBy(col("sim").desc, col("id_a"))
    scored.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .select(col("id_b").as("drop_id"), col("id_a").as("keep_id"),
        col("cid"), col("sim"))
  }
}
