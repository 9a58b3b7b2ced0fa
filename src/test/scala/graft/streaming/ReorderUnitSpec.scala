package graft.streaming

import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

/** The skip-write fast path must RE-ARM the wake-up timer: Spark clears a
  * stored timeout on every function invocation that does not set one, so
  * a no-op batch (all incoming rows frontier-late) would otherwise cancel
  * the pending-release (or idle-reclaim) timer — and if the key then goes
  * quiet, its buffered events are never released and its state never
  * reclaimed. Driven through the real processKeyOrdered via Spark's
  * public TestGroupState harness; all four ordered streams share the
  * identical guard + [[Reorder.rearmOnSkip]] call.
  */
class RearmOnSkipSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def gs(st: Option[StreamingEwma.EwmaOrderedState], wmMs: Long) =
    TestGroupState.create[StreamingEwma.EwmaOrderedState](
      org.apache.spark.api.java.Optional.fromNullable(st.orNull),
      GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.of(wmMs),
      hasTimedOut = false)

  private def lateRow(tUs: Long) = StreamingEwma.EwmaEventT(
    1L, tUs, 9L, 7L, new java.sql.Timestamp(tUs / 1000L))

  test("skip with a pending buffer re-arms the release timer") {
    val st = StreamingEwma.EwmaOrderedState(0L, init = false,
      frontierUs = 1500000L,
      pending = Array(StreamingEwma.EwmaPend(2000000L, 1L, 5L)))
    val state = gs(Some(st), wmMs = 1000L)
    // one frontier-late straggler: ready empty, still == pending → skip
    val out = StreamingEwma.processKeyOrdered(3, None, 0L)(
      1L, Iterator(lateRow(1200000L)), state)
    assert(out.isEmpty)
    assert(!state.isUpdated, "skip path must not rewrite state")
    assert(state.getTimeoutTimestampMs.isPresent,
      "the pending-release timer was cancelled by the skip path")
    assert(state.getTimeoutTimestampMs.get() == 2000L) // pending min, in ms
  }

  test("skip with an empty buffer re-arms the idle-reclaim timer") {
    val st = StreamingEwma.EwmaOrderedState(800L, init = true,
      frontierUs = 1500000L, pending = Array.empty)
    val state = gs(Some(st), wmMs = 1000L)
    val out = StreamingEwma.processKeyOrdered(3, None, 60000L)(
      1L, Iterator(lateRow(1200000L)), state)
    assert(out.isEmpty)
    assert(state.getTimeoutTimestampMs.isPresent,
      "the idle-reclaim timer was cancelled by the skip path")
    assert(state.getTimeoutTimestampMs.get() == 1000L + 60000L)
  }

  test("skip with an empty buffer and no idle TTL sets no timer") {
    val st = StreamingEwma.EwmaOrderedState(800L, init = true,
      frontierUs = 1500000L, pending = Array.empty)
    val state = gs(Some(st), wmMs = 1000L)
    StreamingEwma.processKeyOrdered(3, None, 0L)(
      1L, Iterator(lateRow(1200000L)), state)
    assert(!state.getTimeoutTimestampMs.isPresent)
  }
}

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
