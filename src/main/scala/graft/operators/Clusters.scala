package graft.operators

import org.apache.spark.internal.Logging
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over near-duplicate pairs — the canonical step after
  * pairwise dedup: pair lists ([[TextDedup.minhashDuplicates]],
  * [[TextDedup.ngramJaccardDuplicates]], [[VectorOps.embeddingDuplicates]])
  * become duplicate *clusters*, and one canonical document per cluster
  * survives into the training mix.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — the standard
  * shuffle-based CC at data-lake scale. Unlike naive min-label propagation
  * (O(diameter) rounds — a 1M-node chain needs 1M shuffles), the star
  * operations contract every component to a star in O(log n) rounds, each
  * round two groupBy shuffles over the edge set. Duplicate components are
  * near-cliques in practice, so typical convergence is 2-3 rounds.
  *
  * Scale shape per round: edges live as (u, v) id pairs only — no payloads;
  * the min-neighbor aggregate is map-side partial; `localCheckpoint`
  * truncates the iterative lineage so round N's plan does not replay rounds
  * 1..N-1 (and spills to executor-local storage, not the driver).
  * Convergence is detected from ONE aggregate job per round — the edge
  * count plus an order-independent xxhash64-XOR fingerprint of the distinct
  * edge set, computed in the same `agg` — never by collecting edges to the
  * driver, and without the two extra `except`/`isEmpty` jobs a literal
  * set-equality check would launch per round.
  */
object Clusters extends Logging {

  /** (id, cluster) labels for every node appearing in `pairs`, where
    * `cluster` is the smallest node id in the component. Ids must be
    * long-castable.
    *
    * @param pairs frame holding two id columns (one undirected edge per row;
    *              duplicates and orientation don't matter)
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxRounds: Int = 50): DataFrame = {
    // r15 measured-and-reverted: LAZY localCheckpoint(false) with the
    // stats aggregate as the materializing action (halving actions per
    // round on paper) read ~equal warm but 10-30% WORSE in the driver's
    // cold bench shape (alternated ONLY-mode: eager 2.81/2.99 s vs lazy
    // 3.89/3.30 s at sf0.1) — deferring materialization folds the whole
    // round into one larger first-execution job and loses the eager
    // barrier's stage-by-stage adaptive execution. Keep the eager form.
    var e = pairs
      .select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()

    def sym(d: DataFrame): DataFrame =
      d.union(d.select(col("v").as("u"), col("u").as("v")))

    /** m(u) = min(neighbors(u) ∪ {u}) over the symmetric view. */
    def mins(s: DataFrame): DataFrame =
      s.groupBy("u").agg(min(col("v")).as("_mn"))
        .select(col("u"), least(col("_mn"), col("u")).as("m"))

    // (count, fingerprint) of a distinct edge set in one job: XOR of the
    // per-edge xxhash64 is order-independent and cannot overflow (sum
    // could, and Spark 4's ANSI mode would throw). Equal (count, xor) on
    // consecutive distinct sets declares them equal — a 2^-64 collision
    // risk, traded for dropping the per-round `except` + `isEmpty` jobs.
    def stats(d: DataFrame): (Long, Long) = {
      val r = d.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    var (prevCount, prevXor) = stats(e)
    var round = 0
    var converged = prevCount == 0L
    while (!converged && round < maxRounds) {
      // large-star: every neighbor v > u connects to u's min m
      val s1 = sym(e)
      val ls = s1.join(mins(s1), "u")
        .filter(col("v") > col("u") && col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
      // small-star: every neighbor v <= u, and u itself, connects to u's
      // min m — the (u,u) self-rows make one join cover both emissions
      val s2 = sym(ls)
      val ss = s2.filter(col("v") <= col("u"))
        .union(s2.select(col("u"), col("u").as("v")).distinct())
        .join(mins(s2), "u")
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint()
      val (curCount, curXor) = stats(ss)
      converged = curCount == prevCount && curXor == prevXor
      prevCount = curCount
      prevXor = curXor
      e = ss
      round += 1
    }
    if (!converged)
      logWarning(s"connected components hit maxRounds=$maxRounds before " +
        "converging; labels may be per-neighborhood minima, not component " +
        "minima (raise maxRounds — star contraction needs O(log n) rounds)")
    // converged edge set is a star forest: (node, root) for every non-root;
    // the symmetric min labels every node (roots label themselves)
    mins(sym(e)).select(col("u").as("id"), col("m").as("cluster"))
  }

  /** Cluster labels for a whole corpus: every document gets the component
    * min of the duplicate-pair graph (its own id when it has no duplicates)
    * plus a canonical flag — the survivor-selection contract of a dedup
    * pipeline (keep `canonical = 1`, drop the rest).
    */
  def clusterLabels(docs: DataFrame, idCol: String,
                    pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val labels = connectedComponents(pairs, aCol, bCol)
    docs.select(col(idCol).cast("long").as("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("cluster"), col("id")).as("cluster_id"))
      .withColumn("canonical",
        (col(idCol) === col("cluster_id")).cast("int"))
  }
}
