package graft.rank

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS over the link graph: minimum hop distance from a seed
  * set, bounded by `maxHops` — the "crawl depth from the seed list" audit a
  * crawler operator runs against its frontier policy (every reachable page
  * should appear at the depth the politeness budget predicts; see
  * reference crawler seeding, crawler/Crawler.java — the reference crawls
  * breadth-first from a single seed URL).
  *
  * Shape: classic frontier iteration. Each round joins ONLY the current
  * frontier (shrinking, checkpointed) against the edge list — never the
  * settled set against the edges — so per-round shuffle volume is
  * O(frontier × avg-degree), not O(V+E). The settled set is an append-only
  * union of checkpointed frontiers; the anti-join that dedups the next
  * frontier scans it once per round. `localCheckpoint` truncates each
  * round's lineage (an iterative self-join otherwise doubles the plan tree
  * per round and dies in the optimizer long before the cluster is busy),
  * exactly like the PageRank converge loop. Early exit on an empty
  * frontier: a 6-hop bound over a connected web graph usually settles in
  * fewer rounds than the bound.
  *
  * At 100 TB the edge list is the big side: it stays put (hash-partitioned
  * by src once, reused every round via the exchange-reuse the stable
  * partitioning gives AQE), while the small frontier shuffles to it.
  * Dangling targets (urls never crawled) settle like any other node — they
  * simply have no outgoing edges to expand.
  */
object Bfs {

  /** @param seeds  one column `url` — hop-0 nodes
    * @param edges  columns `src`, `dst`
    * @return (url, hop) — min hop per reachable url, hop <= maxHops */
  def hops(seeds: DataFrame, edges: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0: $maxHops")
    val e = edges.select(col("src"), col("dst"))
    var settled = seeds.select(col("url")).distinct()
      .withColumn("hop", lit(0)).localCheckpoint()
    var frontier = settled.select("url")
    var hop = 0
    while (hop < maxHops && !frontier.isEmpty) {
      hop += 1
      val next = frontier.join(e, frontier("url") === e("src"))
        .select(col("dst").as("url")).distinct()
        .join(settled, Seq("url"), "left_anti")
        .withColumn("hop", lit(hop))
        .localCheckpoint()
      settled = settled.union(next)
      frontier = next.select("url")
    }
    settled
  }
}
