package graft.io

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Z-order layout: the Morton key against a JVM replica, bucketization
  * boundaries, and the property the layout exists for — a conjunctive
  * rectangle predicate prunes most files on per-file min/max stats, where
  * a one-column sort layout prunes none.
  */
class LayoutSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def mortonRef(dims: Seq[Long], bits: Int): Long = {
    val d = dims.size
    var z = 0L
    for (i <- 0 until bits; j <- 0 until d)
      z |= ((dims(j) >> i) & 1L) << (i * d + j)
    z
  }

  test("mortonKey matches the JVM replica for 2 and 3 dims") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(300)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong,
      rnd.nextInt(32).toLong))
    val df = rows.toDF("a", "b", "c")
    val got2 = df.select(col("a"), col("b"),
        Layout.mortonKey(Seq(col("a"), col("b")), 8).as("z"))
      .as[(Long, Long, Long)].collect()
    got2.foreach { case (a, b, z) =>
      assert(z == mortonRef(Seq(a, b), 8), s"2-dim ($a, $b)")
    }
    val got3 = df.select(col("a") % 32, col("b") % 32, col("c"),
        Layout.mortonKey(Seq(col("a") % 32, col("b") % 32, col("c")), 5).as("z"))
      .as[(Long, Long, Long, Long)].collect()
    got3.foreach { case (a, b, c, z) =>
      assert(z == mortonRef(Seq(a, b, c), 5), s"3-dim ($a, $b, $c)")
    }
  }

  test("rangeBucket clamps and maps bounds to the bucket edges") {
    import spark.implicits._
    val df = Seq(-100L, 900L, 52950L, 105000L, 999999L).toDF("v")
    val got = df.select(col("v"),
        Layout.rangeBucket(col("v"), 900L, 105000L, 8).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(got(-100L) == 0L && got(900L) == 0L) // below-lo clamps to edge
    assert(got(105000L) == 255L && got(999999L) == 255L)
    assert(got(52950L) == 127L) // midpoint: (52050 * 255) / 104100 = 127.5 -> 127
    // monotone across the range
    val seq = (900L to 105000L by 1000L).toDF("v")
      .select(Layout.rangeBucket(col("v"), 900L, 105000L, 8).as("b"))
      .as[Long].collect()
    assert(seq.zip(seq.tail).forall { case (x, y) => x <= y })
  }

  test("hilbertKey: column expression == JVM replica, exhaustively; the " +
       "index is a true Hilbert curve (bijective, unit-adjacent)") {
    import spark.implicits._
    // exhaustive at bits=4 (256 cells): staged column rounds == JVM replica
    val all = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val got = Layout.withHilbertKey(all.toDF("x", "y"),
        col("x"), col("y"), 4, "h")
      .select(col("x"), col("y"), col("h"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, h) =>
      assert(h == Layout.hilbertIndex(4, x, y), s"($x, $y)")
    }
    // sampled at the catalog's bits=8 (the scale where a naive inlined
    // expression tree measured OOM — the staged rounds must stay linear)
    val rnd = new scala.util.Random(11)
    val sample = Seq.fill(300)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    Layout.withHilbertKey(sample.toDF("x", "y"), col("x"), col("y"), 8, "h")
      .select(col("x"), col("y"), col("h"))
      .as[(Long, Long, Long)].collect()
      .foreach { case (x, y, h) =>
        assert(h == Layout.hilbertIndex(8, x, y), s"bits=8 ($x, $y)")
      }
    // the Hilbert property, JVM-exhaustive at bits=4 AND bits=8: every
    // cell gets exactly one index in [0, 4^bits) and consecutive indexes
    // are Manhattan-distance-1 neighbors (the locality guarantee Z-order
    // lacks — morton jumps at every power-of-two boundary)
    for (bits <- Seq(4, 8)) {
      val n = 1 << bits
      val cell = new Array[Long](n * n) // d -> packed (x, y)
      java.util.Arrays.fill(cell, -1L)
      for (x <- 0 until n; y <- 0 until n) {
        val d = Layout.hilbertIndex(bits, x, y)
        assert(d >= 0 && d < n.toLong * n && cell(d.toInt) == -1L,
          s"bits=$bits: index $d not bijective")
        cell(d.toInt) = x.toLong * n + y
      }
      for (d <- 0 until n * n - 1) {
        val (x1, y1) = (cell(d) / n, cell(d) % n)
        val (x2, y2) = (cell(d + 1) / n, cell(d + 1) % n)
        assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
          s"bits=$bits: step $d not unit-adjacent")
      }
    }
  }

  test("hilbert beats z-order on unaligned key ranges (the file-boundary " +
       "shape): tighter average bounding boxes") {
    // real file boundaries from repartitionByRange land at arbitrary key
    // values, not power-of-4 blocks (where z-order is optimal by
    // construction). Measure what a file's parquet min/max stats would
    // expose: the bounding-box semi-perimeter of random UNALIGNED
    // contiguous key ranges under each curve (Moon et al. 1996).
    val bits = 8
    val n = 1 << bits
    val hCell = new Array[Int](n * n) // d -> x * n + y, per curve
    val zCell = new Array[Int](n * n)
    for (x <- 0 until n; y <- 0 until n) {
      hCell(Layout.hilbertIndex(bits, x, y).toInt) = x * n + y
      var z = 0
      for (i <- 0 until bits) // morton, dim order as mortonKey(Seq(x, y))
        z |= (((x >> i) & 1) << (i * 2)) | (((y >> i) & 1) << (i * 2 + 1))
      zCell(z) = x * n + y
    }
    def semiPerimeter(cells: Array[Int], from: Int, len: Int): Long = {
      var (xlo, xhi, ylo, yhi) = (n, -1, n, -1)
      for (d <- from until from + len) {
        val x = cells(d) / n; val y = cells(d) % n
        xlo = math.min(xlo, x); xhi = math.max(xhi, x)
        ylo = math.min(ylo, y); yhi = math.max(yhi, y)
      }
      (xhi - xlo).toLong + (yhi - ylo).toLong
    }
    val rnd = new scala.util.Random(42)
    val trials = Seq.fill(200)(rnd.nextInt(n * n - 700))
    val hAvg = trials.map(f => semiPerimeter(hCell, f, 700)).sum.toDouble / trials.size
    val zAvg = trials.map(f => semiPerimeter(zCell, f, 700)).sum.toDouble / trials.size
    assert(hAvg < zAvg,
      f"hilbert should bound unaligned ranges tighter: $hAvg%.1f vs $zAvg%.1f")
  }

  test("hilbert layout prunes a rectangle scan at least as well as z-order") {
    val dims = Seq(
      Layout.ZDim(col("l_quantity"), 1L, 50L),
      Layout.ZDim(floor(col("l_extendedprice")), 900L, 105000L))
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val hdir = java.nio.file.Files.createTempDirectory("hilbert").toString
    Layout.writeHilbertOrdered(li, hdir, dims, bits = 8, numFiles = 16)
    val stats = spark.read.parquet(hdir)
      .groupBy(input_file_name().as("f"))
      .agg(min("l_quantity").as("qlo"), max("l_quantity").as("qhi"),
        min("l_extendedprice").as("plo"), max("l_extendedprice").as("phi"))
    val total = stats.count()
    val hit = stats.filter(col("qlo") <= 30 && col("qhi") >= 20 &&
      col("plo") <= 40000 && col("phi") >= 20000).count()
    assert(total == 16, s"expected 16 files, got $total")
    assert(hit * 2 <= total, s"hilbert pruned too little: $hit/$total")
    // re-arrangement, not a transformation
    assert(spark.read.parquet(hdir).count() == li.count())
  }

  test("z-order layout prunes a rectangle scan; a 1-col sort layout cannot") {
    val dims = Seq(
      Layout.ZDim(col("l_quantity"), 1L, 50L),
      Layout.ZDim(floor(col("l_extendedprice")), 900L, 105000L))
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val zdir = java.nio.file.Files.createTempDirectory("zorder").toString
    val ldir = java.nio.file.Files.createTempDirectory("linear").toString
    Layout.writeZOrdered(li, zdir, dims, bits = 8, numFiles = 16)
    li.repartitionByRange(16, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(ldir)

    // per-file bounding boxes — what parquet row-group stats expose to a
    // scan — then count files a (qty in [20,30]) x (price in [20k,40k])
    // rectangle cannot prune
    def intersecting(path: String): (Long, Long) = {
      val stats = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("l_quantity").as("qlo"), max("l_quantity").as("qhi"),
          min("l_extendedprice").as("plo"), max("l_extendedprice").as("phi"))
      val total = stats.count()
      val hit = stats.filter(col("qlo") <= 30 && col("qhi") >= 20 &&
        col("plo") <= 40000 && col("phi") >= 20000).count()
      (hit, total)
    }
    val (zHit, zTotal) = intersecting(zdir)
    val (lHit, lTotal) = intersecting(ldir)
    assert(zTotal == 16 && lTotal == 16, s"expected 16 files, got $zTotal/$lTotal")
    // orderkey says nothing about qty/price: every linear file intersects
    assert(lHit >= 15, s"linear layout should be unprunable, hit $lHit/16")
    // the z-layout must prune at least half the files the linear one scans
    assert(zHit * 2 <= lHit, s"z-order pruned too little: $zHit vs $lHit")

    // the layout is a re-arrangement, not a transformation
    val (n0, s0) = (li.count(),
      li.agg(sum("l_extendedprice")).head().getDouble(0))
    val back = spark.read.parquet(zdir)
    val (n1, s1) = (back.count(),
      back.agg(sum("l_extendedprice")).head().getDouble(0))
    assert(n0 == n1 && math.abs(s0 - s1) < 1e-6 * math.abs(s0))
  }

  test("compact merges small files, preserves content, and is idempotent") {
    def parquetFiles(p: String): Seq[java.io.File] =
      new java.io.File(p).listFiles().toSeq
        .filter(f => f.getName.endsWith(".parquet") && f.getName.startsWith("part-"))
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_extendedprice")
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    li.repartition(64).write.parquet(dir) // the streaming-sink shape: 64 shards
    assert(parquetFiles(dir).size == 64)
    val before = li.agg(count(lit(1)), sum("l_extendedprice")).head()

    val total = parquetFiles(dir).map(_.length).sum
    val n = Layout.compact(spark, dir, targetBytes = (total + 3) / 4)
    assert(n == 4 && parquetFiles(dir).size == 4, s"expected 4 files, got $n")
    val after = spark.read.parquet(dir)
      .agg(count(lit(1)), sum("l_extendedprice")).head()
    assert(before.getLong(0) == after.getLong(0) &&
      math.abs(before.getDouble(1) - after.getDouble(1))
        < 1e-6 * math.abs(before.getDouble(1)))

    // idempotent: same target on compacted output keeps the count stable
    val total2 = parquetFiles(dir).map(_.length).sum
    val n2 = Layout.compact(spark, dir, targetBytes = (total2 + 3) / 4)
    assert(n2 <= 5 && parquetFiles(dir).size.toLong == n2,
      s"re-compaction should be stable, got $n2 files")
    assert(spark.read.parquet(dir).count() == before.getLong(0))
  }

  /** A FileSystem that throws on the Nth mutating operation (rename or
    * delete) — the crash-injection seam for the compact swap protocol.
    */
  private class FailingFs(underlying: org.apache.hadoop.fs.FileSystem,
                          failAt: Int)
      extends org.apache.hadoop.fs.FilterFileSystem(underlying) {
    private var ops = 0
    private def tick(): Unit = {
      ops += 1
      if (ops == failAt) throw new java.io.IOException(s"injected crash (op $ops)")
    }
    override def rename(src: org.apache.hadoop.fs.Path,
                        dst: org.apache.hadoop.fs.Path): Boolean = {
      tick(); super.rename(src, dst)
    }
    override def delete(p: org.apache.hadoop.fs.Path,
                        recursive: Boolean): Boolean = {
      tick(); super.delete(p, recursive)
    }
  }

  test("compact swap survives a crash at every step: data never lost, " +
       "recovery always restores a complete readable directory") {
    val conf = spark.sparkContext.hadoopConfiguration
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_extendedprice")
    val expect = li.agg(count(lit(1)), sum("l_extendedprice")).head()

    def assertComplete(dir: String): Unit = {
      // "a reader always sees a complete directory": primary path exists
      // and reads back the full content (old or new — never a mix/absence)
      val got = spark.read.parquet(dir)
        .agg(count(lit(1)), sum("l_extendedprice")).head()
      assert(got.getLong(0) == expect.getLong(0) &&
        math.abs(got.getDouble(1) - expect.getDouble(1))
          < 1e-6 * math.abs(expect.getDouble(1)))
    }

    // swapCompacted has exactly 3 mutating ops: rename(main->trash),
    // rename(compact->main), delete(trash). Kill at each in turn.
    for (failAt <- 1 to 3) {
      val dir = java.nio.file.Files.createTempDirectory("crash").toString + "/t"
      li.repartition(16).write.parquet(dir)
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
      // stage the rewrite exactly as compact() does, then crash mid-swap
      val total = fs.getContentSummary(new org.apache.hadoop.fs.Path(dir)).getLength
      spark.read.parquet(dir).coalesce(2)
        .write.mode("overwrite").parquet(dir + ".compact")
      intercept[java.io.IOException] {
        Layout.swapCompacted(new FailingFs(fs, failAt), dir)
      }
      // crash + recovery: the reader finds a complete directory again
      Layout.recoverCompact(fs, dir)
      assertComplete(dir)
      assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + ".trash")) &&
        !fs.exists(new org.apache.hadoop.fs.Path(dir + ".compact")),
        s"recovery (failAt=$failAt) left swap residue")
      // and a plain re-run (which recovers internally) lands the final state
      val n = Layout.compact(spark, dir, targetBytes = (total + 1) / 2)
      assert(n >= 1)
      assertComplete(dir)
    }

    // crash BEFORE the swap (stale partial .compact from a dead writer):
    // recovery discards it and the re-run compacts cleanly
    val dir = java.nio.file.Files.createTempDirectory("crash").toString + "/t"
    li.repartition(16).write.parquet(dir)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    li.limit(3).write.parquet(dir + ".compact") // "partial" leftover
    val n = Layout.compact(spark, dir)
    assert(n >= 1)
    assertComplete(dir)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + ".compact")))
  }
}
