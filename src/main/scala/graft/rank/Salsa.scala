package graft.rank

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SALSA (Lempel & Moran 2000) — the stochastic cousin of [[Hits]]: the
  * same hubs-and-authorities structure, but each step spreads a node's
  * score EQUALLY over its links (divide by degree) instead of summing
  * raw neighbor scores. That one change makes the walk a random walk on
  * the bipartite hub/authority graph — scores stop being hijacked by
  * densely interlinked cliques (the TKC effect HITS suffers), which is
  * why production follow/recommendation systems (famously Twitter's
  * who-to-follow) run SALSA rather than HITS.
  *
  * Fixed-iteration power method (threshold-free → oracle-exact):
  *   aᵢ(v) = Σ_{u→v} hᵢ₋₁(u) / outdeg(u)
  *   hᵢ(u) = Σ_{u→v} aᵢ(v) / indeg(v)
  * over the LIVE edge set (both endpoints in `nodes`), h₀ = 1 per node.
  * Mass moves conservatively along edges; dangling hubs / sourceless
  * authorities simply hold score 0 from round one.
  *
  * Scale shape: identical to [[PageRank]]/[[Personalized]] — the edge
  * list (with both degree columns) shuffles ONCE onto its join keys and
  * is reused every round; each round is two join-aggregates over
  * (url, double) frames; per-round localCheckpoint truncates the
  * self-referential plan.
  */
object Salsa {

  /** @param nodes one column `url`
    * @param edges columns `src`, `dst`; edges with either endpoint
    *              outside `nodes` are dropped
    * @return (url, hub, auth) after `iters` rounds, zero-filled over
    *         `nodes`, values UNROUNDED */
  def run(spark: SparkSession, nodes: DataFrame, edges: DataFrame,
          iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val n = nodes.select(col("url")).distinct().persist()
    val e0 = edges.select(col("src"), col("dst"))
      .join(n.select(col("url").as("src")), Seq("src"))
      .join(n.select(col("url").as("dst")), Seq("dst"))
    val outdeg = e0.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val indeg = e0.groupBy(col("dst")).agg(count(lit(1)).as("indeg"))
    val live = e0.join(outdeg, Seq("src")).join(indeg, Seq("dst")).persist()

    // ONE materialization barrier per round (was two): the round's auth
    // frame stays a LAZY subplan of the hub checkpoint — auth's zero-filled
    // rows only ever contribute exact +0.0 terms to the hub sums, so
    // feeding the aggregation output (un-zero-filled) straight into the
    // hub half computes bit-identical hub values with one fewer join and
    // one fewer eager job per round. The final zero-filled auth frame is
    // reconstructed once from the second-to-last hub checkpoint.
    def aMassOf(hub: DataFrame): DataFrame = live
      .join(hub.select(col("url").as("src"), col("hub")), Seq("src"))
      .groupBy(col("dst"))
      .agg(sum(col("hub") / col("outdeg")).as("mass"))
    var h = n.select(col("url"), lit(1.0).as("hub")).localCheckpoint()
    var hPrev: DataFrame = null
    var i = 0
    while (i < iters) {
      i += 1
      val hOld = hPrev
      hPrev = h
      val hMass = live
        .join(aMassOf(h).select(col("dst"), col("mass").as("auth")), Seq("dst"))
        .groupBy(col("src"))
        .agg(sum(col("auth") / col("indeg")).as("mass"))
      h = n.join(hMass, n("url") === hMass("src"), "left")
        .select(n("url"), coalesce(col("mass"), lit(0.0)).as("hub"))
        .localCheckpoint()
      if (hOld != null) hOld.unpersist() // checkpoint blocks of round i−2
    }
    val aM = aMassOf(hPrev)
    val a = n.join(aM, n("url") === aM("dst"), "left")
      .select(n("url"), coalesce(col("mass"), lit(0.0)).as("auth"))
    val out = h.join(a, Seq("url")).select(col("url"), col("hub"), col("auth"))
      .localCheckpoint()
    if (hPrev != null) hPrev.unpersist()
    h.unpersist()
    live.unpersist()
    n.unpersist()
    out
  }
}
