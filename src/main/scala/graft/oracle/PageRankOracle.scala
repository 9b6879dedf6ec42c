package graft.oracle

import scala.collection.mutable
import graft.rank.RefUrl

/** Single-threaded PageRank with the reference's exact algebra
  * (jobs/PageRank.java:18-180) — the oracle for [[graft.rank.PageRank]].
  * Node ids are normalized urls (the reference hashes both sides with the
  * same function, so grouping is equivalent).
  */
object PageRankOracle {

  final case class State(rank: Double, prev: Double, links: List[String])

  def init(pages: Seq[(String, String)]): mutable.LinkedHashMap[String, State] = {
    val state = mutable.LinkedHashMap.empty[String, State]
    for ((url, html) <- pages) {
      val self = RefUrl.selfNormalize(url)
      if (self != null)
        state.update(self, State(1.0, 1.0, RefUrl.outlinks(self, html)))
    }
    state
  }

  /** Returns (url → final rank, iterations). */
  def pageRank(pages: Seq[(String, String)], threshold: Double = 0.01,
               percent: Double = 0.8, maxIter: Int = 100): (Map[String, Double], Int) = {
    val state = init(pages)
    var cnt = 0
    var converged = false
    while (!converged && cnt < maxIter) {
      cnt += 1
      val mass = mutable.LinkedHashMap.empty[String, Double]
      for ((url, _) <- state) mass.update(url, 0.0) // keep-alive (self, "0")
      for ((_, s) <- state if s.links.nonEmpty) {
        val v = 0.85 * s.rank / s.links.length
        for (l <- s.links)
          mass.update(l, mass.getOrElse(l, 0.0) + v) // dangling targets collect too…
      }
      // …but the inner join drops them (PageRank.java:106): iterate state keys
      var achieved = 0L
      for ((url, s) <- state) {
        val newRank = mass(url) + 0.15
        state.update(url, State(newRank, s.rank, s.links))
        if (math.abs(newRank - s.rank) < threshold) achieved += 1
      }
      converged = state.isEmpty || achieved.toDouble / state.size >= percent
    }
    (state.iterator.map { case (u, s) => u -> s.rank }.toMap, cnt)
  }
}
