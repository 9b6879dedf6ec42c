package graft.util

/** FNV-1a 64-bit over UTF-8 bytes — the ONE shared implementation of the
  * engine's string-id hash (stable across JVMs, dependency-free, identical
  * on driver and executors). Consumers: [[graft.index.IndexBuild]]'s
  * urlHash / open-vocabulary term ids and [[graft.rank.PageRank.runHashed]]'s
  * node ids; both docstrings anticipate widening to 128-bit ids past ~10^11
  * keys — widen HERE so the copies cannot drift. */
object Fnv {
  def hash64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes("UTF-8")
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }
}
