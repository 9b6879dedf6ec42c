package graft.rank

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** HITS (hubs & authorities, Kleinberg 1998) over an edge list — the
  * second classic link-analysis scorer next to [[PageRank]]: a page's
  * AUTHORITY is the normalized sum of its in-linking pages' hub scores; a
  * page's HUB score is the normalized sum of its out-links' authorities.
  * Normalization is per-iteration division by the MAX raw score (the
  * sqrt-free variant) so every arithmetic step is exactly replicable in
  * the ANSI-SQL oracle.
  *
  * Scale shape mirrors PageRank's: each half-iteration is one edge-keyed
  * join + one map-side-combined sum keyed by the opposite endpoint —
  * (url, score) rows shuffle, never page content; the max is a scalar agg
  * to the driver. Plan depth stays bounded to one iteration via an eager
  * localCheckpoint per half-step (same anti-plan-explosion discipline as
  * `PageRank.converge`/`Dedup.connectedComponents`); superseded rounds
  * are unpersisted eagerly. */
object Hits {

  /** Fixed-iteration HITS. `nodes`: (url); `edges`: (src, dst). Edges with
    * either endpoint outside `nodes` are dropped (the dangling-link rule,
    * matching PageRank's inner-join drop). Returns one (url, hub, auth)
    * row per node, unrounded. */
  def run(nodes: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val nodesP = nodes.select(col("url")).persist(StorageLevel.MEMORY_AND_DISK)
    val live = edges.select(col("src"), col("dst"))
      .join(nodesP.select(col("url").as("src")), Seq("src"))
      .join(nodesP.select(col("url").as("dst")), Seq("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    live.count()

    // one half-step: raw(url) = Σ score over `live` keyed by `outKey`,
    // zero-filled over all nodes, then max-normalized (all-zero → kept raw)
    def half(scores: DataFrame, scoreCol: String, joinKey: String,
             outKey: String, outCol: String): DataFrame = {
      val raw = nodesP
        .join(live.join(scores.withColumnRenamed("url", joinKey), Seq(joinKey))
          .groupBy(col(outKey).as("url")).agg(sum(col(scoreCol)).as("v")),
          Seq("url"), "left")
        .select(col("url"), coalesce(col("v"), lit(0.0)).as("raw"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val m = raw.agg(max(col("raw"))).head().getDouble(0)
      val out = raw.select(col("url"),
          (if (m == 0.0) col("raw") else col("raw") / m).as(outCol))
        .localCheckpoint() // eager: bounds lineage to this half-step
      raw.unpersist()
      out
    }

    var hub = nodesP.select(col("url"), lit(1.0).as("hub")).localCheckpoint()
    var auth: DataFrame = null
    for (_ <- 1 to iters) {
      val nextAuth = half(hub, "hub", "src", "dst", "auth")
      if (auth != null) auth.unpersist()
      auth = nextAuth
      val nextHub = half(auth, "auth", "dst", "src", "hub")
      hub.unpersist()
      hub = nextHub
    }
    val result = hub.join(auth, Seq("url"))
      .select(col("url"), col("hub"), col("auth"))
      .localCheckpoint()
    hub.unpersist(); auth.unpersist(); live.unpersist(); nodesP.unpersist()
    result
  }
}
