package graft.operators

import graft.SparkSpec

import scala.util.Random

/** Blocked-edit-distance fuzzy dedup: exact differential against a JVM
  * replica of the blocking + banded-levenshtein semantics, the recall-1
  * contract for single-region edits, hot-block capping, and minLen hygiene.
  */
class FuzzyDedupSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = d(0); d(0) = i
      for (j <- 1 to b.length) {
        val t = d(j)
        d(j) = math.min(math.min(d(j) + 1, d(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = t
      }
    }
    d(b.length)
  }

  /** JVM replica of normalize → two-affix blocking → census cap →
    * verify.
    */
  private def replica(docs: Seq[(Long, String)], maxDist: Int, cap: Int,
                      affix: Int = 32, minLen: Int = 8): Set[(Long, Long, Long)] = {
    val norms = docs
      .map { case (id, t) => id -> t.toLowerCase.replaceAll("[^a-z0-9]", "") }
      .filter(_._2.length >= minLen)
    val byId = norms.toMap
    val keyed = norms.flatMap { case (id, n) =>
      Seq(("p:" + n.take(affix)) -> id, ("s:" + n.takeRight(affix)) -> id)
    }
    val blocks = keyed.groupBy(_._1).values.map(_.map(_._2).distinct.sorted).toSeq
    val light = blocks.filter(_.size <= cap)
      .flatMap(ids => ids.combinations(2).map(p => (p(0), p(1))))
    val heavyIds = blocks.filter(_.size > cap).flatten.distinct
    val heavy = heavyIds.groupBy(byId).values
      .flatMap(ids => ids.sorted.combinations(2).map(p => (p(0), p(1))))
    (light ++ heavy).distinct
      .map { case (a, b) => (a, b, lev(byId(a), byId(b)).toLong) }
      .filter(_._3 <= maxDist).toSet
  }

  private def run(docs: Seq[(Long, String)], maxDist: Int, cap: Int) =
    TextDedup.fuzzyDuplicates(docs.toDF("doc_id", "text"), "doc_id", "text",
        maxDist = maxDist, bucketCap = cap)
      .as[(Long, Long, Long)].collect().toSet

  test("matches the JVM replica on random corpora with planted edits") {
    val rnd = new Random(41)
    val alpha = "abcdefghij"
    def randStr(n: Int) = Seq.fill(n)(alpha(rnd.nextInt(alpha.size))).mkString
    for (trial <- 0 until 3) {
      val bases = Seq.fill(40)(randStr(40 + rnd.nextInt(60)))
      val docs = bases.zipWithIndex.flatMap { case (b, i) =>
        val id = i * 10L
        // a tail-edited copy, a head-edited copy, an untouched copy
        val tail = b.dropRight(rnd.nextInt(4)) + randStr(rnd.nextInt(4))
        val head = randStr(rnd.nextInt(4)) + b.drop(rnd.nextInt(4))
        Seq((id, b), (id + 1, tail), (id + 2, head), (id + 3, b))
      }
      assert(run(docs, maxDist = 8, cap = 200) == replica(docs, 8, 200),
        s"trial $trial")
    }
  }

  test("recall 1 for pairs whose edits leave one affix region intact") {
    val rnd = new Random(7)
    val alpha = "klmnopqrst"
    def randStr(n: Int) = Seq.fill(n)(alpha(rnd.nextInt(alpha.size))).mkString
    // edits strictly AFTER the first 32 norm chars (prefix intact), and
    // strictly BEFORE the last 32 (suffix intact)
    val docs = (0 until 25).flatMap { i =>
      val b = randStr(80)
      val afterEdit = b.take(40) + randStr(3) + b.drop(43) // middle splice
      val frontEdit = randStr(2) + b.drop(2) // first 2 chars replaced
      Seq((i * 10L, b), (i * 10L + 1, afterEdit), (i * 10L + 2, frontEdit))
    }
    val got = run(docs, maxDist = 8, cap = 200)
    for (i <- 0 until 25) {
      assert(got.exists(p => p._1 == i * 10L && p._2 == i * 10L + 1),
        s"prefix-blocked pair of base $i missing")
      assert(got.exists(p => p._1 == i * 10L && p._2 == i * 10L + 2),
        s"suffix-blocked pair of base $i missing")
    }
    // distances are the exact JVM levenshtein
    val norm = docs.toMap
    for ((a, b, d) <- got)
      assert(d == lev(norm(a), norm(b)), s"pair ($a,$b)")
  }

  test("over-cap blocks fall back to exact-norm groups; exact dups survive") {
    // 30 docs share the prefix affix but have distinct tails (boilerplate
    // block), incl. one planted exact-duplicate triple; cap = 10
    val shared = "commonboilerplateprefixthirtytwo!" // 32 alnum chars
    val docs = (0L until 30L).map(i => (i, s"$shared tail number $i")) ++
      Seq((100L, s"$shared the same tail"), (101L, s"$shared the same tail"),
        (102L, s"$shared the same tail"))
    val got = run(docs, maxDist = 8, cap = 10)
    // the exact triple survives the cap (dist 0, via exact-norm grouping)
    assert(got.contains((100L, 101L, 0L)) && got.contains((100L, 102L, 0L)) &&
      got.contains((101L, 102L, 0L)))
    // cross pairs of the distinct-tail members are capped away even when
    // within edit distance (e.g. 'tail number 1' vs 'tail number 2')
    assert(!got.exists(p => p._1 < 100L && p._2 < 100L))
    // and the replica agrees on the whole output
    assert(got == replica(docs, 8, 10))
  }

  test("norms shorter than minLen never pair") {
    val docs = Seq((1L, "a b!"), (2L, "ab"), (3L, "abcdefgh"), (4L, "abcdefgh"))
    val got = run(docs, maxDist = 8, cap = 200)
    assert(got == Set((3L, 4L, 0L)))
  }
}
