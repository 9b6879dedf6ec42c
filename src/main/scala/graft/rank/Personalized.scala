package graft.rank

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Personalized PageRank: random walks restart at a SEED set instead of
  * uniformly — the "related pages for THIS page/topic" scorer (the global
  * [[PageRank]] blend ranks universal importance; q78's bibliographic
  * coupling finds structural twins; PPR interpolates: closeness to the
  * seeds under the same 0.85-damped walk the reference runs,
  * Project/src/.../PageRank.java:90-104).
  *
  * Power iteration, fixed `iters` rounds (threshold-free → oracle-exact):
  *   r₀(v)    = p(v)                       (teleport mass: 1/|seeds| on seeds)
  *   rᵢ₊₁(v)  = 0.15·p(v) + Σ_{(u,v)} 0.85·rᵢ(u)/outdeg(u)
  * zero-filled over the node frame each round (q32's oracle shape; dangling
  * targets keep their teleport-only rank).
  *
  * Scale shape, same discipline as [[PageRank.converge]]: per-round
  * `localCheckpoint` truncates the self-join lineage (the
  * plan-doubles-per-round trap), the edge list shuffles ONCE onto its join
  * partitioning and is reused every round, and contributions are computed
  * from the FRONTIER only — rows with rank ≠ 0 (mass spreads outward from
  * the seeds like the BFS frontier, so early rounds touch a sliver of a
  * web-scale graph; excluded zero-rank rows contribute exactly +0.0, so
  * the filter changes work, never values). At 10⁹⁺ seeds-queries you'd
  * switch to forward-push/Monte-Carlo PPR per query; this is the one-seed-
  * set batch scorer.
  */
object Personalized {

  /** @param nodes one column `url` — the state space
    * @param edges columns `src`, `dst` (dst outside `nodes` is dropped,
    *              matching the reference's dangling-drop inner join)
    * @param seeds one column `url`; must be non-empty
    * @return (url, rank) for EVERY node, fixed-iteration PPR */
  def run(spark: SparkSession, nodes: DataFrame, edges: DataFrame,
          seeds: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val seedsD = seeds.select(col("url")).distinct()
    val nSeeds = seedsD.count()
    require(nSeeds > 0, "personalized PageRank needs a non-empty seed set")

    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val live = edges.select(col("src"), col("dst"))
      .join(nodes.select(col("url").as("dst")), Seq("dst"))
      .join(deg, Seq("src"))
      .persist()
    val tele = nodes.select(col("url"))
      .join(seedsD.withColumn("_s", lit(1)), Seq("url"), "left")
      .select(col("url"),
        when(col("_s").isNotNull, lit(1.0 / nSeeds)).otherwise(lit(0.0)).as("t"))
      .persist()

    var r = tele.select(col("url"), col("t").as("rank")).localCheckpoint()
    var i = 0
    while (i < iters) {
      i += 1
      val mass = live
        .join(r.filter(col("rank") =!= 0.0).select(col("url").as("src"), col("rank")),
          Seq("src"))
        .groupBy(col("dst"))
        .agg(sum(lit(damping) * col("rank") / col("outdeg")).as("mass"))
      r = tele.join(mass, tele("url") === mass("dst"), "left")
        .select(tele("url"),
          (lit(1.0 - damping) * col("t") + coalesce(col("mass"), lit(0.0))).as("rank"))
        .localCheckpoint()
    }
    live.unpersist()
    tele.unpersist()
    r
  }
}
