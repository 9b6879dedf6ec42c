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
    // zero-filled over all nodes, then max-normalized (all-zero → kept raw).
    // The RAW frame is the checkpointed one; the max-normalization stays a
    // LAZY one-expression projection on top of it (raw/m is deterministic,
    // so every consumer computes the identical doubles) — this halves the
    // eager jobs per half-step vs checkpointing the normalized frame too,
    // leaving one checkpoint job plus one trivial max over cached blocks.
    def half(scores: DataFrame, scoreCol: String, joinKey: String,
             outKey: String, outCol: String): (DataFrame, DataFrame) = {
      val raw = nodesP
        .join(live.join(scores.withColumnRenamed("url", joinKey), Seq(joinKey))
          .groupBy(col(outKey).as("url")).agg(sum(col(scoreCol)).as("v")),
          Seq("url"), "left")
        .select(col("url"), coalesce(col("v"), lit(0.0)).as("raw"))
        .localCheckpoint() // eager: bounds lineage to this half-step
      val m = raw.agg(max(col("raw"))).head().getDouble(0)
      val out = raw.select(col("url"),
        (if (m == 0.0) col("raw") else col("raw") / m).as(outCol))
      (out, raw)
    }

    var hub = nodesP.select(col("url"), lit(1.0).as("hub")).localCheckpoint()
    var auth: DataFrame = null
    var hubRaw: DataFrame = hub
    var authRaw: DataFrame = null
    for (_ <- 1 to iters) {
      val (nextAuth, nextAuthRaw) = half(hub, "hub", "src", "dst", "auth")
      // the new auth checkpoint is materialized — the PREVIOUS auth raw
      // (two half-steps back) can release its blocks now
      if (authRaw != null) authRaw.unpersist()
      auth = nextAuth; authRaw = nextAuthRaw
      val (nextHub, nextHubRaw) = half(auth, "auth", "dst", "src", "hub")
      hubRaw.unpersist()
      hub = nextHub; hubRaw = nextHubRaw
    }
    val result = hub.join(auth, Seq("url"))
      .select(col("url"), col("hub"), col("auth"))
      .localCheckpoint()
    hubRaw.unpersist(); authRaw.unpersist(); live.unpersist(); nodesP.unpersist()
    result
  }
}
