package graft.query

import org.scalatest.funsuite.AnyFunSuite

/** Regression for the accumulator-sizing overflow (round-1 VERDICT item 1):
  * `dfSum.toInt` overflowed for df sums > 2^31, leaving a tiny fixed table
  * whose linear probe spun forever once full. The map now takes a Long hint,
  * clamps the eager allocation, and RESIZES at 70% load.
  */
class LongDoubleMapSpec extends AnyFunSuite {

  test("web-scale expected hint (> Int.MaxValue) neither overflows nor over-allocates") {
    // pre-fix: toInt made this negative → capacity 64 → infinite probe after
    // 64 inserts. Now: modest eager allocation, grows on demand.
    val m = new LongDoubleMap(Int.MaxValue.toLong * 3L)
    var i = 0L
    while (i < 200000L) { m.add(i * 2654435761L, 1.0); i += 1 }
    assert(m.size == 200000)
  }

  test("grows far past a small hint without losing entries") {
    val m = new LongDoubleMap(4L)
    val n = 300000
    var i = 0
    while (i < n) { m.add(i.toLong, i.toDouble); i += 1 }
    // second pass accumulates — every key must still resolve to its slot
    i = 0
    while (i < n) {
      val v = m.add(i.toLong, 1.0)
      assert(v == i.toDouble + 1.0, s"key $i")
      i += 1
    }
    assert(m.size == n)
    val sum = m.toBuffer.map(_._2).sum
    assert(sum == (0 until n).map(_.toDouble + 1.0).sum)
  }

  test("home slots track capacity growth (no clustering past the pre-size cap)") {
    // regression: the home-slot hash used a FIXED '>>> 40' (24 bits of
    // hash), so any capacity above 2^24 homed every key into the first 16M
    // slots and the probe degenerated into one cluster. Growing well past
    // the 2^20 eager-allocation cap with sequential-ish keys must stay fast
    // and exact — a degenerate cluster would turn this loop quadratic.
    val m = new LongDoubleMap(4L)
    val n = 3000000 // capacity reaches 2^23: multiple shift recomputations
    val t0 = System.nanoTime()
    var i = 0
    while (i < n) { m.add(i.toLong, 1.0); i += 1 }
    val sec = (System.nanoTime() - t0) / 1e9
    assert(m.size == n)
    // generous CI bound: the healthy path runs in well under a second;
    // a clustered probe would take minutes
    assert(sec < 30.0, s"insert pass took ${sec}s — probe clustering?")
    var j = 0
    while (j < n) {
      assert(m.add(j.toLong, 1.0) == 2.0, s"key $j")
      j += 1
    }
  }

  test("kthAndNext and collectAtLeast agree after resizes") {
    val m = new LongDoubleMap(2L)
    for (i <- 1 to 5000) m.add(i.toLong, i.toDouble)
    val (kth, next) = m.kthAndNext(10)
    assert(kth == 4991.0 && next == 4990.0)
    val top = m.collectAtLeast(kth)
    assert(top.size == 10 && top.map(_._2).min == 4991.0)
  }
}
