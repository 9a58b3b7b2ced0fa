package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up of the driver-generated testdata: replicate
  * every table `replicas`× with disjoint key ranges (primary AND foreign
  * keys offset together, so referential integrity and join selectivities
  * survive), writing each table as ONE parquet file in the driver's
  * layout (`<dst>/<table>.parquet`) so `Bench`, `Verify`, and
  * `tools/compare.py` run on it unchanged.
  *
  *   runMain graft.ScaleUp [srcDir] [dstDir] [replicas]
  *   # default: /root/testdata/sf0.1 -> target/sf1 at 10x (the sf1 proof)
  *
  * Replica 0 is the original data verbatim. Content columns that feed the
  * DEDUP families are decorrelated across replicas — a naive 10× copy
  * would make every document a 10-way near-duplicate and every embedding
  * a 10-way exact duplicate, turning the dedup benchmarks into a
  * pathological 90%-duplicate corpus instead of 10× more data:
  *
  *  - `documents.text`: ~30% of word positions substitute a dictionary
  *    word chosen by `xxhash64(word, pos, r)` — 5-gram shingle overlap
  *    across replicas collapses (P[5 consecutive words all survive]
  *    ≈ 0.7^5 ≈ 0.17) while WITHIN a replica two identical texts still
  *    substitute identically (the hash excludes doc_id), so planted
  *    exact-duplicate groups keep existing in every replica.
  *  - `embeddings.embedding`: replica r applies a fixed ISOMETRY — a
  *    cyclic coordinate shift by 7r plus hash-chosen sign flips. Within a
  *    replica every pairwise cosine (cluster structure, planted
  *    duplicates) is EXACTLY the original's (isometries preserve inner
  *    products), while a vector's cosine to its other-replica images is
  *    that of two unrelated directions (≈ 0 ± 1/√dim) — below any dedup
  *    threshold, unlike a parent-mix construction, which keeps
  *    cos ≥ 0.6 to a parent and manufactures cross-replica duplicates.
  *
  * Events offset `user_id` per replica: 10× keys each carrying the
  * original per-key series, so pattern/sessionization work scales in keys
  * (the production shape) rather than per-key stream length.
  *
  * Correctness at the new scale is still oracle-checked: Verify dumps the
  * Spark results and the DuckDB compare replays the oracle SQL on the
  * SAME scaled parquet, so no property of the scaled data is trusted.
  */
object ScaleUp {

  private val dict: Seq[String] = Seq(
    "river", "stone", "window", "quiet", "signal", "harbor", "maple",
    "copper", "meadow", "lantern", "cedar", "marble", "violet", "ember",
    "willow", "falcon", "timber", "prairie", "cobalt", "summit", "garnet",
    "hollow", "juniper", "anchor", "beacon", "canyon", "drift", "ellipse",
    "fathom", "glacier", "harvest", "isthmus", "jasper", "kernel", "lagoon",
    "mosaic", "nectar", "orchard", "pebble", "quarry", "russet", "saffron",
    "thicket", "umber", "vertex", "walnut", "xenon", "yonder", "zephyr",
    "basalt")

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.drop(1).headOption.getOrElse("target/sf1")
    val replicas = args.drop(2).headOption.map(_.toInt).getOrElse(10)
    require(replicas >= 1, s"need replicas >= 1, got $replicas")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nCust = Tables.customer(spark, src).count()
    val nSupp = Tables.supplier(spark, src).count()
    val nPart = Tables.part(spark, src).count()
    val nOrd = Tables.orders(spark, src).count()
    val nEvt = Tables.events(spark, src).count()
    val nUser = Tables.events(spark, src)
      .agg(max(col("user_id"))).head().getLong(0) + 1L
    val nDoc = Tables.documents(spark, src).count()
    val nVec = Tables.embeddings(spark, src).count()

    /** Cross the table with replica index r (0 = verbatim). */
    def replicate(df: DataFrame): DataFrame =
      df.withColumn("r", explode(lit((0 until replicas).toArray)))

    def off(c: String, stride: Long) = col(c) + col("r") * stride

    def writeOne(df: DataFrame, name: String): Unit = {
      val tmp = s"$dst/_tmp_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val dir = new java.io.File(tmp)
      val part = dir.listFiles().find(_.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no parquet part written for $name"))
      val target = new java.io.File(s"$dst/$name.parquet")
      if (target.exists()) target.delete()
      java.nio.file.Files.move(part.toPath, target.toPath)
      dir.listFiles().foreach(_.delete())
      dir.delete()
      println(s"[scaleup] $name -> $target (${target.length() / 1024} KiB)")
    }

    new java.io.File(dst).mkdirs()

    // fixed dimensions: TPC-H keeps region/nation constant across SF
    writeOne(Tables.region(spark, src), "region")
    writeOne(Tables.nation(spark, src), "nation")

    writeOne(replicate(Tables.customer(spark, src))
      .select(off("c_custkey", nCust).as("c_custkey"),
        col("c_name"), col("c_nationkey"), col("c_acctbal"),
        col("c_mktsegment")), "customer")

    writeOne(replicate(Tables.supplier(spark, src))
      .select(off("s_suppkey", nSupp).as("s_suppkey"),
        col("s_name"), col("s_nationkey"), col("s_acctbal")), "supplier")

    writeOne(replicate(Tables.part(spark, src))
      .select(off("p_partkey", nPart).as("p_partkey"),
        col("p_name"), col("p_brand"), col("p_type"), col("p_size"),
        col("p_retailprice")), "part")

    writeOne(replicate(Tables.orders(spark, src))
      .select(off("o_orderkey", nOrd).as("o_orderkey"),
        off("o_custkey", nCust).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority")), "orders")

    writeOne(replicate(Tables.lineitem(spark, src))
      .select(off("l_orderkey", nOrd).as("l_orderkey"),
        off("l_partkey", nPart).as("l_partkey"),
        off("l_suppkey", nSupp).as("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate")), "lineitem")

    writeOne(replicate(
        Tables.normalizeTs(Tables.events(spark, src)))
      .select(off("event_id", nEvt).as("event_id"), col("ts"),
        off("user_id", nUser).as("user_id"),
        col("event_type"), col("value"), col("props")), "events")

    // text decorrelation: substitute ~30% of word positions by a
    // dictionary word keyed on (word, pos, r) — see the scaladoc
    val dictArr = array(dict.map(lit): _*)
    val subText = when(col("text").isNull, lit(null: String))
      .when(col("r") === 0, col("text"))
      .otherwise(array_join(
        zip_with(split(col("text"), " "),
          sequence(lit(0), greatest(size(split(col("text"), " ")) - 1, lit(0))),
          (w, i) => when(pmod(xxhash64(w, i, col("r")), lit(10)) < 3,
            element_at(dictArr,
              (pmod(xxhash64(i, col("r")), lit(dict.size)) + 1).cast("int")))
            .otherwise(w)),
        " "))
    writeOne(replicate(Tables.documents(spark, src))
      .select(off("doc_id", nDoc).as("doc_id"), subText.as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars",
        coalesce(length(col("text")).cast("long"), lit(0L))), "documents")

    // embedding decorrelation: per-replica isometry (see the scaladoc) —
    // v'_j = s(r,j) * v_{(j + 7r) mod dim}, s = ±1 by hash
    val base = Tables.embeddings(spark, src)
    val dim = base.select(size(col("embedding"))).head().getInt(0)
    val iso = transform(sequence(lit(0), lit(dim - 1)),
      j => (element_at(col("embedding"),
          (pmod(j + lit(7) * col("r"), lit(dim)) + 1).cast("int")) *
        (lit(1) - lit(2) * pmod(xxhash64(j, col("r")), lit(2)))).cast("float"))
    writeOne(replicate(base)
      .select(off("vec_id", nVec).as("vec_id"),
        when(col("r") === 0, col("embedding")).otherwise(iso).as("embedding"),
        col("label")), "embeddings")

    spark.stop()
  }
}
