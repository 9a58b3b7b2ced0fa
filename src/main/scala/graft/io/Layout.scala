package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering for scan
  * pruning — the storage-layout half of multi-predicate scans, the way
  * [[Bucketing]] is the storage-layout half of joins.
  *
  * A 100 TB fact table is read through parquet row-group min/max stats: a
  * filter prunes a file only when the file's value RANGE misses the
  * predicate. Sorting by one column makes that column's ranges tight and
  * every other column's ranges full-width — a second predicate prunes
  * nothing. Interleaving the bits of several range-bucketized dimensions
  * into one sort key (the Z-order curve) keeps every participating
  * dimension's per-file range narrow at once, so a conjunctive rectangle
  * predicate skips most files on stats alone (the Delta/Iceberg OPTIMIZE
  * ZORDER design, built here from public Spark primitives).
  *
  * Bounds are supplied by the caller, not re-derived per write: at scale
  * they come from table statistics or domain metadata, and a static bound
  * only ever costs clamping — outliers land in the edge bucket and never
  * corrupt the key. All arithmetic is integer-exact (the bucket multiply is
  * bounded well inside 2^53, asserted at construction), so external engines
  * reproduce the key bit-for-bit.
  */
object Layout {

  /** One Z-order dimension: an integral-valued expression with inclusive
    * static bounds. Values outside [lo, hi] clamp to the edge buckets.
    */
  final case class ZDim(dim: Column, lo: Long, hi: Long) {
    require(hi > lo, s"ZDim bounds must satisfy lo < hi, got [$lo, $hi]")
  }

  /** Range-bucketize `c` into [0, 2^bits): clamp to [lo, hi], then scale
    * linearly so lo -> 0 and hi -> 2^bits - 1. The scale is
    * floor((v - lo) * (2^bits - 1) / (hi - lo)) — computed through a
    * double, which is exact while (hi - lo) * (2^bits - 1) < 2^53
    * (required below), and floor == integer div for the non-negative
    * operands a clamped value guarantees.
    */
  def rangeBucket(c: Column, lo: Long, hi: Long, bits: Int): Column = {
    require(bits >= 1 && bits <= 16, s"bits must be in [1, 16], got $bits")
    val n = (1L << bits) - 1
    require(hi - lo <= (1L << 52) / n,
      s"span ${hi - lo} * $n overflows exact double arithmetic")
    val clamped = least(greatest(c.cast("long"), lit(lo)), lit(hi))
    floor(((clamped - lit(lo)) * lit(n)).cast("double") / lit((hi - lo).toDouble))
      .cast("long")
  }

  /** Interleave the low `bits` bits of the already-bucketized `dims` into
    * one Morton key: output bit (i * d + j) = bit i of dimension j, so
    * dimension 0 owns the even bits of a 2-D key. Pure narrow bit
    * arithmetic — 2 dims x 8 bits is 16 codegen'd shift/mask terms.
    */
  def mortonKey(dims: Seq[Column], bits: Int): Column = {
    require(dims.nonEmpty && dims.size * bits <= 63,
      s"${dims.size} dims x $bits bits exceeds a signed 64-bit key")
    val d = dims.size
    val terms = for {
      i <- 0 until bits
      (c, j) <- dims.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * d + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Add the Z-order key column for `dims` (bucketize + interleave). */
  def withZOrderKey(df: DataFrame, dims: Seq[ZDim], bits: Int = 8,
                    out: String = "zkey"): DataFrame =
    df.withColumn(out,
      mortonKey(dims.map(z => rangeBucket(z.dim, z.lo, z.hi, bits)), bits))

  /** Hilbert index of two already-bucketized dims (values in [0, 2^bits))
    * — the locality-optimal sibling of [[mortonKey]]: consecutive key
    * values are UNIT-adjacent cells (Z-order jumps across the space at
    * every power-of-two boundary), so a contiguous key range covers a
    * more compact rectangle and per-file min/max bounds come out tighter
    * at the same file count (the Hilbert option of Delta/Iceberg OPTIMIZE,
    * built from public primitives; curve construction per Hilbert 1891 /
    * the standard xy2d bit transform).
    *
    * `bits` rounds, each a pure integer CASE/bit step over (x, y, d) —
    * fully codegen'd, no UDF. Unlike the Morton interleave (each input
    * bit feeds ONE output term), a Hilbert round reads the previous
    * round's x and y several times, so inlining the rounds into one
    * Column expression would double the tree per round (~4^bits nodes —
    * measured OOM at bits=8). [[withHilbertKey]] therefore stages each
    * round as a PROJECTION: round columns become plan attributes computed
    * once, generated code stays linear in `bits`, and CollapseProject
    * keeps the stages apart because the aliases are multiply referenced.
    * The reflection uses the full grid width (n-1-v), keeping every
    * intermediate in [0, 2^bits) — no negative values anywhere, so SQL
    * engines replay the rounds bit-for-bit with plain BIGINT arithmetic
    * ([[hilbertRoundsSql]] emits the same rounds as DuckDB SQL; the JVM
    * replica [[hilbertIndex]] and the exhaustive bijectivity +
    * unit-adjacency property are spec-locked in LayoutSpec).
    */
  def withHilbertKey(df: DataFrame, x0: Column, y0: Column, bits: Int,
                     out: String): DataFrame = {
    require(bits >= 1 && bits <= 16, s"bits must be in [1, 16], got $bits")
    val n = 1L << bits
    val taken = df.columns.toSet
    def nm(base: String, i: Int): String = {
      val name = s"_gh_$base$i"
      require(!taken(name), s"column $name already present")
      name
    }
    var cur = df
      .withColumn(nm("x", 0), x0.cast("long"))
      .withColumn(nm("y", 0), y0.cast("long"))
      .withColumn(nm("d", 0), lit(0L))
    for (i <- 0 until bits) {
      val s = n >> (i + 1)
      val x = col(nm("x", i)); val y = col(nm("y", i)); val d = col(nm("d", i))
      val rx = when(x.bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L))
      val ry = when(y.bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L))
      val refl = x.bitwiseAND(lit(s)) > 0 && !(y.bitwiseAND(lit(s)) > 0)
      val swap = !(y.bitwiseAND(lit(s)) > 0)
      val xr = when(refl, lit(n - 1) - x).otherwise(x)
      val yr = when(refl, lit(n - 1) - y).otherwise(y)
      cur = cur.withColumns(Map(
        nm("d", i + 1) -> (d + lit(s * s) * (lit(3L) * rx).bitwiseXOR(ry)),
        nm("x", i + 1) -> when(swap, yr).otherwise(xr),
        nm("y", i + 1) -> when(swap, xr).otherwise(yr)))
    }
    val drops = (0 to bits).flatMap(i =>
      Seq(nm("x", i), nm("y", i), nm("d", i))).filterNot(_ == nm("d", bits))
    cur.withColumnRenamed(nm("d", bits), out).drop(drops: _*)
  }

  /** JVM replica of [[hilbertKey]] — the differential oracle for the spec
    * and the reference for external engines.
    */
  private[io] def hilbertIndex(bits: Int, x0: Long, y0: Long): Long = {
    val n = 1L << bits
    var x = x0; var y = y0; var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** The same unrolled rounds as portable SQL: returns (header CTEs, final
    * key expression) where round i reads columns `x{i} y{i} d{i}` and
    * writes `x{i+1} y{i+1} d{i+1}`. The caller supplies a CTE named `h0`
    * with columns (..., x0, y0, d0) where d0 = 0; the key is `d{bits}` in
    * CTE `h{bits}`. Kept here beside the Column implementation so the two
    * spellings can only drift together.
    */
  def hilbertRoundsSql(bits: Int): String = {
    val n = 1L << bits
    (0 until bits).map { i =>
      val s = n >> (i + 1)
      val j = i + 1
      s"""h$j AS (SELECT *,
         |  d$i + ${s * s} * xor(3 * (CASE WHEN (x$i & $s) > 0 THEN 1 ELSE 0 END),
         |                       (CASE WHEN (y$i & $s) > 0 THEN 1 ELSE 0 END)) AS d$j,
         |  CASE WHEN (y$i & $s) = 0
         |       THEN (CASE WHEN (x$i & $s) > 0 THEN ${n - 1} - y$i ELSE y$i END)
         |       ELSE x$i END AS x$j,
         |  CASE WHEN (y$i & $s) = 0
         |       THEN (CASE WHEN (x$i & $s) > 0 THEN ${n - 1} - x$i ELSE x$i END)
         |       ELSE y$i END AS y$j
         |  FROM h$i)""".stripMargin
    }.mkString(",\n")
  }

  /** Write `df` Hilbert-clustered on exactly two dims — [[writeZOrdered]]
    * with the locality-optimal key.
    */
  def writeHilbertOrdered(df: DataFrame, path: String, dims: Seq[ZDim],
                          bits: Int = 8, numFiles: Int = 64): Unit = {
    require(dims.size == 2, s"hilbert layout is 2-dimensional, got ${dims.size}")
    require(numFiles >= 1)
    val key = "_graft_hkey"
    require(!df.columns.contains(key), s"column $key already present")
    withHilbertKey(df,
        rangeBucket(dims(0).dim, dims(0).lo, dims(0).hi, bits),
        rangeBucket(dims(1).dim, dims(1).lo, dims(1).hi, bits), bits, key)
      .repartitionByRange(numFiles, col(key))
      .sortWithinPartitions(key)
      .drop(key)
      .write.mode("overwrite").parquet(path)
  }

  /** Write `df` Z-order-clustered on `dims` into ~`numFiles` files: key,
    * range-partition on the key (contiguous key ranges -> each file covers
    * a compact rectangle-ish region of the dim space -> tight per-file
    * min/max on EVERY dim), sort within partitions so row groups inside a
    * file are tight too, drop the transient key. The one range shuffle is
    * the write-time cost the layout amortizes over every later scan.
    */
  def writeZOrdered(df: DataFrame, path: String, dims: Seq[ZDim],
                    bits: Int = 8, numFiles: Int = 64): Unit = {
    require(numFiles >= 1)
    val key = "_graft_zkey"
    require(!df.columns.contains(key), s"column $key already present")
    withZOrderKey(df, dims, bits, key)
      .repartitionByRange(numFiles, col(key))
      .sortWithinPartitions(key)
      .drop(key)
      .write.mode("overwrite").parquet(path)
  }

  /** Compact a parquet directory's small files into ~`targetBytes` files —
    * the small-files remedy every long-running ingest needs: a streaming
    * sink or fine-grained partitioned write leaves thousands of KB-sized
    * files whose per-file open/footer cost dominates the next scan, and
    * whose task count explodes the next job's scheduler overhead.
    *
    * Target count = ceil(on-disk bytes / targetBytes) — sized from the
    * DIRECTORY's real size, not a row-count guess, so compaction is
    * idempotent (re-running on compacted output is a near-no-op rewrite of
    * the same count). `coalesce` (not repartition) merges inputs without a
    * shuffle; an optional `sortBy` re-sorts within the merged files (a
    * shuffle-free sortWithinPartitions) to keep row-group stats tight
    * through the rewrite. Returns the number of part files ACTUALLY
    * written, which can undershoot the target when targetBytes is below
    * `spark.sql.files.maxPartitionBytes`: coalesce merges read splits but
    * never divides one, so the output count is bounded by the read's split
    * count.
    *
    * Crash safety (the data is never lost, and the primary path is never
    * missing across a crash): the rewrite lands at `path + ".compact"`,
    * then [[swapCompacted]] renames path -> `path + ".trash"`, renames
    * `.compact` -> path, and deletes `.trash`. No rewrite-in-place ever
    * happens, and the original directory survives (as `.trash`) until the
    * new one is live. A crash at ANY step is repaired by [[recoverCompact]]
    * — run automatically at the start of every compact() — which restores
    * the original from `.trash` when the primary is missing, clears a
    * stranded `.trash` when the swap had completed, and discards a stale
    * `.compact`. The only reader-visible gap is the instant between the
    * two renames of a LIVE swap (no local/HDFS filesystem has an atomic
    * directory exchange); a concurrent reader can retry, and crash + retry
    * always finds a complete directory.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024,
              sortBy: Seq[String] = Nil): Long = {
    require(targetBytes >= 1)
    val hadoopPath = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverCompact(fs, path) // repair any interrupted previous swap first
    val totalBytes = fs.getContentSummary(hadoopPath).getLength
    val nFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val df0 = spark.read.parquet(path).coalesce(nFiles)
    val df = if (sortBy.isEmpty) df0
             else df0.sortWithinPartitions(sortBy.map(col): _*)
    df.write.mode("overwrite").parquet(path.stripSuffix("/") + ".compact")
    swapCompacted(fs, path)
    fs.listStatus(hadoopPath)
      .count(_.getPath.getName.startsWith("part-")).toLong
  }

  /** The three-step directory swap behind [[compact]]: the new data is at
    * `path + ".compact"`; move the old primary aside to `path + ".trash"`,
    * promote `.compact` to the primary, then drop the trash. Every
    * intermediate state is repaired by [[recoverCompact]].
    */
  private[io] def swapCompacted(fs: org.apache.hadoop.fs.FileSystem,
                                path: String): Unit = {
    val base = path.stripSuffix("/")
    val main = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(base + ".compact")
    val trash = new org.apache.hadoop.fs.Path(base + ".trash")
    if (!fs.rename(main, trash))
      throw new java.io.IOException(s"compact: rename $path -> $trash failed")
    if (!fs.rename(tmp, main))
      throw new java.io.IOException(s"compact: rename $tmp -> $path failed")
    fs.delete(trash, true)
  }

  /** Repair an interrupted [[compact]] swap at `path`. Idempotent; a no-op
    * when no swap was in flight. State machine over the two side paths:
    *
    *   - `.trash` exists, primary missing — crashed between the two
    *     renames: restore `.trash` -> primary (the ORIGINAL data; the
    *     complete-but-unpromoted `.compact` is discarded and the re-run
    *     rewrites it — favoring the known-good original over a rewrite
    *     whose completeness only the writer could attest).
    *   - `.trash` exists, primary exists — crashed after the promotion,
    *     before the trash delete: the swap completed; drop `.trash`.
    *   - `.compact` exists — a stale (possibly partial) rewrite from a
    *     crash before the first rename; discard it.
    */
  private[io] def recoverCompact(fs: org.apache.hadoop.fs.FileSystem,
                                 path: String): Unit = {
    val base = path.stripSuffix("/")
    val main = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(base + ".compact")
    val trash = new org.apache.hadoop.fs.Path(base + ".trash")
    if (fs.exists(trash)) {
      if (!fs.exists(main)) {
        if (!fs.rename(trash, main))
          throw new java.io.IOException(
            s"compact recovery: rename $trash -> $path failed")
      } else fs.delete(trash, true)
    }
    if (fs.exists(tmp)) fs.delete(tmp, true)
  }
}
