package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hand-salted skew join: the explicit remedy for a hot join key that a
  * shuffle join would funnel into one reducer task.
  *
  * AQE's skew-join split handles the SORT-MERGE case after the fact by
  * re-splitting oversized partitions, but it cannot help when the plan is a
  * shuffled-hash join, when the skew is in a stateful streaming stage, or
  * when one key is so hot that even a split partition's BUILD side blows
  * memory. Salting fixes the distribution in the plan itself: the fact side
  * spreads each key across `salt` sub-keys, the dimension side replicates
  * each row `salt` times (dim rows are the small side by assumption — the
  * replication is `salt x |dim|`, bounded and broadcast-grade), and the
  * join runs on (key, salt) whose hottest partition is 1/salt of the
  * original. Join OUTPUT is provably identical: every fact row meets
  * exactly the one dim replica carrying its salt.
  *
  * The salt is `pmod(hash(all fact columns), salt)` — deterministic under
  * task retry/speculation (no rand()), and row-dependent rather than
  * key-dependent, so a hot KEY spreads as long as its rows' payloads
  * differ. Fully duplicate fact rows share a salt by construction; a fact
  * table with massive full-row duplication should dedup or pre-aggregate
  * first (cheaper than any join).
  */
object Skew {

  /** The deterministic per-row salt in [0, salt). Note `hash` rejects
    * MapType columns (Catalyst has no canonical map order); project such a
    * fact side to hashable columns (or a map_entries sort) before salting.
    */
  def saltColumn(df: DataFrame, salt: Int): Column =
    pmod(hash(df.columns.map(col): _*), lit(salt))

  /** Join `fact` to `dim` on `factKey == dimKey` with an s-way salt.
    *
    * Supported join types: inner, left / left_outer (an unmatched fact row
    * null-extends exactly once — no dim replica carries its salt+key),
    * left_semi. Right/full joins are NOT supported: the replicated dim side
    * would emit one row per salt for unmatched dim keys.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                 dimKey: String, salt: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    val ok = Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi")
    require(ok(joinType.toLowerCase),
      s"saltedJoin supports ${ok.mkString("/")}, got $joinType")
    require(!fact.columns.contains("_salt") && !dim.columns.contains("_salt"),
      "input already has a _salt column")
    val f = fact.withColumn("_salt", saltColumn(fact, salt))
    val d = dim.withColumn("_salt", explode(sequence(lit(0), lit(salt - 1))))
    f.join(d, f(factKey) === d(dimKey) && f("_salt") === d("_salt"), joinType)
      .drop(f("_salt")).drop(d("_salt"))
  }
}
