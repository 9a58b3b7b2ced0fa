package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Pure-JVM checks for the reorder buffer's release path after the
  * merge-insert rewrite: semantics must equal the original
  * sort-the-union formulation on arbitrary inputs, both outputs must be
  * sorted (the buffer invariant callers persist), and a pending buffer
  * restored UNSORTED (a checkpoint written by the pre-invariant version)
  * must still release correctly.
  */
class ReorderUnitSpec extends AnyFunSuite {

  private case class Ev(tUs: Long, id: Long)
  private implicit val ord: Ordering[Ev] = Ordering.by(e => (e.tUs, e.id))

  /** The original release semantics, kept as the differential oracle. */
  private def referenceRelease(pending: Seq[Ev], incoming: Seq[Ev],
                               frontierUs: Long, watermarkUs: Long)
      : (Seq[Ev], Seq[Ev], Int) = {
    val fresh = incoming.filter(_.tUs > frontierUs)
    val nLate = incoming.size - fresh.size
    val (ready, still) = (pending ++ fresh).partition(_.tUs <= watermarkUs)
    (ready.sorted, still.sorted, nLate)
  }

  test("release == the sort-the-union reference on randomized inputs") {
    val rnd = new Random(83)
    (0 until 300).foreach { trial =>
      val pending = Seq.fill(rnd.nextInt(20))(
        Ev(rnd.nextInt(100).toLong, rnd.nextLong(1000))).sorted
      val incoming = Seq.fill(rnd.nextInt(20))(
        Ev(rnd.nextInt(100).toLong, rnd.nextLong(1000)))
      val frontier = rnd.nextInt(60).toLong - 10L
      val wm = rnd.nextInt(120).toLong - 10L
      val got = Reorder.release(pending, incoming, frontier, wm, (e: Ev) => e.tUs)
      val exp = referenceRelease(pending, incoming, frontier, wm)
      assert(got._1 == exp._1, s"trial $trial ready")
      assert(got._2.sorted == exp._2, s"trial $trial still")
      assert(got._2 == got._2.sorted, s"trial $trial: still must come back SORTED")
      assert(got._3 == exp._3, s"trial $trial nLate")
    }
  }

  test("an unsorted restored pending buffer (older-version checkpoint) still releases correctly") {
    val pending = Seq(Ev(30, 3), Ev(10, 1), Ev(50, 5), Ev(20, 2)) // NOT sorted
    val incoming = Seq(Ev(40, 4), Ev(5, 0))
    val (ready, still, nLate) =
      Reorder.release(pending, incoming, frontierUs = 7L, watermarkUs = 35L,
        (e: Ev) => e.tUs)
    assert(nLate == 1) // Ev(5) is behind the frontier
    assert(ready == Seq(Ev(10, 1), Ev(20, 2), Ev(30, 3)))
    assert(still == Seq(Ev(40, 4), Ev(50, 5)))
  }

  test("mergeSorted is a stable linear merge") {
    val rnd = new Random(89)
    (0 until 200).foreach { trial =>
      val a = Seq.fill(rnd.nextInt(25))(Ev(rnd.nextInt(50).toLong, rnd.nextLong(99))).sorted
      val b = Seq.fill(rnd.nextInt(25))(Ev(rnd.nextInt(50).toLong, rnd.nextLong(99))).sorted
      assert(Reorder.mergeSorted(a, b) == (a ++ b).sorted, s"trial $trial")
    }
    assert(Reorder.mergeSorted(Seq.empty[Ev], Seq(Ev(1, 1))) == Seq(Ev(1, 1)))
    assert(Reorder.mergeSorted(Seq(Ev(1, 1)), Seq.empty[Ev]) == Seq(Ev(1, 1)))
  }

  test("idleTimeoutMs sits strictly above the watermark") {
    assert(Reorder.idleTimeoutMs(1000L, 500L) == 1500L)
    assert(Reorder.idleTimeoutMs(0L, 500L) == 500L)
    assert(Reorder.idleTimeoutMs(-1L, 500L) == 500L) // no watermark yet
    assert(Reorder.idleTimeoutMs(1000L, 0L) == 1001L) // degenerate TTL still legal
  }
}
