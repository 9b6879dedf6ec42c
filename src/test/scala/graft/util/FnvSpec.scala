package graft.util

import org.scalatest.funsuite.AnyFunSuite

/** Golden vectors for the shared FNV-1a id-hash family. The 128-bit vectors
  * were computed with an independent arbitrary-precision implementation of
  * the published FNV-1a-128 parameters (prime 2^88 + 2^8 + 0x3b, offset
  * basis 0x6c62272e07bb014262b821756295c58d), so the limb arithmetic in
  * [[Fnv.hash128]] is checked against big-integer ground truth. */
class FnvSpec extends AnyFunSuite {

  test("hash64 golden vectors (published FNV-1a test values)") {
    // fnv1a64("") = offset basis; "a" and "foobar" are the classic vectors
    assert(Fnv.hash64("") == 0xcbf29ce484222325L)
    assert(Fnv.hash64("a") == 0xaf63dc4c8601ec8cL)
    assert(Fnv.hash64("foobar") == 0x85944171f73967e8L)
  }

  test("hash128 golden vectors vs big-integer ground truth") {
    val vectors = Seq(
      ("", 0x6c62272e07bb0142L, 0x62b821756295c58dL),
      ("a", 0xd228cb696f1a8cafL, 0x78912b704e4a8964L),
      ("foobar", 0x343e1662793c64bfL, 0x6f0d3597ba446f18L),
      ("http://example.com/page?q=1", 0xdf9cb10510372853L, 0xe1a4511005a7ec74L),
      ("ümläut", 0x904eb5d3b865980dL, 0xd54f444009e5c2cdL))
    for ((s, hi, lo) <- vectors)
      assert(Fnv.hash128(s) == ((hi, lo)), s"hash128($s)")
  }

  test("hash128 limb multiply matches BigInt over random strings") {
    val prime = (BigInt(1) << 88) + (BigInt(1) << 8) + 0x3b
    val mask = (BigInt(1) << 128) - 1
    val offset = BigInt("6c62272e07bb014262b821756295c58d", 16)
    def ref(s: String): (Long, Long) = {
      var h = offset
      for (b <- s.getBytes("UTF-8")) {
        h ^= BigInt(b & 0xff)
        h = (h * prime) & mask
      }
      ((h >> 64).toLong, (h & ((BigInt(1) << 64) - 1)).toLong)
    }
    val rng = new scala.util.Random(99)
    for (_ <- 1 to 200) {
      val s = rng.alphanumeric.take(rng.nextInt(40)).mkString
      assert(Fnv.hash128(s) == ref(s), s"hash128($s)")
    }
  }
}
