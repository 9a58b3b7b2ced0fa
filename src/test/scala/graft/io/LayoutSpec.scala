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
