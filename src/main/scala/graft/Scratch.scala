package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling entry point (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup
    try SparkEntry.queries("q7_filter_agg")(spark, sfDir).count()
    catch { case _: Throwable => () }
    spark.catalog.clearCache()
    import org.apache.spark.sql.functions._
    import org.apache.spark.storage.StorageLevel
    import graft.operators.{Spread, TextDedup}

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // ---- minhash sub-stages (mirrors minhashDuplicates incl. Spread)
    val df = Tables.documents(spark, sfDir)
    val sh = Spread(df).select(col("doc_id").as("id"),
        array_distinct(transform(TextDedup.wordShingles(col("text"), 3),
          s => xxhash64(s))).as("hs"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("mh: sh materialize")(sh.count())
    val numHashes = 128; val bands = 64; val r0 = numHashes / bands
    val mins = sh.select(col("id"), explode(col("hs")).as("h"))
      .groupBy("id")
      .agg(min(xxhash64(col("h"), lit(1))).as("m1"),
        (2 to numHashes).map(i => min(xxhash64(col("h"), lit(i))).as(s"m$i")): _*)
    t("mh: mins")(mins.count())
    val banded = mins.select(col("id"),
      explode(array((0 until bands).map { b =>
        val coords = (b * r0 + 1 to (b + 1) * r0).map(i => col(s"m$i"))
        struct(lit(b).as("band"), xxhash64(coords: _*).as("bucket"))
      }: _*)).as("bk"))
    val keyed = banded.persist(StorageLevel.MEMORY_AND_DISK)
    t("mh: keyed materialize")(keyed.count())
    val heavy = keyed.groupBy("bk").count()
      .filter(col("count") > 200).select("bk")
    t("mh: heavy census")(heavy.count())
    val lightPairs = keyed
      .join(broadcast(heavy), Seq("bk"), "left_anti")
      .groupBy("bk").agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1)
    t("mh: light buckets")(lightPairs.count())
    val full = t("mh: full build")(SparkEntry.queries("dedup_minhash")(spark, sfDir))
    t("mh: full run")(full.count())
    t("mh: full run again")(SparkEntry.queries("dedup_minhash")(spark, sfDir).count())
    spark.catalog.clearCache()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    t("mh: full run NO codegen")(SparkEntry.queries("dedup_minhash")(spark, sfDir).count())
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    spark.catalog.clearCache()

    // ---- simhash sub-stages
    val sig = TextDedup.simhashSignatures(df, "doc_id", "text")
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("sh: signatures")(sig.count())
    val full2 = t("sh: full build")(SparkEntry.queries("dedup_simhash")(spark, sfDir))
    t("sh: full run")(full2.count())
    spark.catalog.clearCache()
    // ---- embed
    t("embed: full run")(SparkEntry.queries("dedup_embed")(spark, sfDir).count())
    spark.catalog.clearCache()
    t("ann_lsh: full run")(SparkEntry.queries("ann_lsh")(spark, sfDir).count())
    spark.catalog.clearCache()
    spark.stop()
  }
}
