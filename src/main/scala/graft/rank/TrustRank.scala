package graft.rank

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TrustRank / spam mass (Gyöngyi, Garcia-Molina, Pedersen, VLDB 2004;
  * spam-mass follow-up 2006) — the link-spam demotion layer a production
  * ranker runs next to PageRank: trust flows from a hand-audited seed
  * whitelist through the SAME damped walk PageRank uses, and pages whose
  * importance arrives mostly from UNtrusted neighborhoods are spam-farm
  * suspects.
  *
  * Both walks reuse [[Personalized]] verbatim — TrustRank IS personalized
  * PageRank with the trusted set as the teleport distribution, and the
  * global baseline is the same iteration with the uniform teleport
  * (seeds = all nodes). Relative spam mass per node:
  *
  *   mass(v) = (pr(v) − trust(v)) / pr(v)
  *
  * ≈1 for pages whose rank owes nothing to trusted sources (farm pages),
  * ≤0 for pages MORE reachable from the seeds than from the uniform walk
  * (the seeds' own neighborhoods). Thresholding is the caller's policy
  * knob; this returns the raw signal.
  *
  * Scale shape: exactly two [[Personalized]] runs (frontier-filtered
  * contributions, per-round localCheckpoint, edge list shuffled once and
  * reused) plus ONE url-keyed join of two (url, double) frames — nothing
  * beyond the PageRank cost envelope the engine already pays.
  */
object TrustRank {

  /** @param nodes   one column `url` — the state space
    * @param edges   columns `src`, `dst` (same dangling-drop semantics as
    *                [[Personalized]]/[[PageRank]])
    * @param trusted one column `url` — the audited whitelist seeds
    * @return (url, pr, trust, spam_mass) for every node, fixed-iteration
    *         power iteration on both walks; values UNROUNDED */
  def spamMass(spark: SparkSession, nodes: DataFrame, edges: DataFrame,
               trusted: DataFrame, iters: Int,
               damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    // FUSED twin walks: both are [[Personalized]]'s algebra (same damped
    // spread, same dangling-drop edge join, same zero-fill), iterated as ONE
    // loop over (url, trust, pr) rows — one edge join + one map-side-combined
    // aggregation per round instead of two, and the final url-keyed join of
    // two rank frames disappears because every round already carries both
    // columns. Per-column arithmetic is identical to the two separate runs:
    // the shared frontier filter (trust ≠ 0 OR pr ≠ 0) only readmits rows
    // whose excluded column contributes exactly +0.0 (pr > 0 everywhere from
    // round 0, so the pr walk's effective frontier is all rows, as before).
    val trustedD = trusted.select(col("url")).distinct()
    val nTrusted = trustedD.count()
    require(nTrusted > 0, "TrustRank needs a non-empty trusted seed set")
    val nNodes = nodes.select(col("url")).distinct().count()
    require(nNodes > 0, "TrustRank needs a non-empty node set")

    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val live = edges.select(col("src"), col("dst"))
      .join(nodes.select(col("url").as("dst")), Seq("dst"))
      .join(deg, Seq("src"))
      .persist()
    val tele = nodes.select(col("url"))
      .join(trustedD.withColumn("_s", lit(1)), Seq("url"), "left")
      .select(col("url"),
        when(col("_s").isNotNull, lit(1.0 / nTrusted)).otherwise(lit(0.0)).as("tt"),
        lit(1.0 / nNodes).as("tp"))
      .persist()

    var r = tele.select(col("url"), col("tt").as("trust"), col("tp").as("pr"))
      .localCheckpoint()
    var i = 0
    while (i < iters) {
      i += 1
      val mass = live
        .join(r.filter(col("trust") =!= 0.0 || col("pr") =!= 0.0)
          .select(col("url").as("src"), col("trust"), col("pr")), Seq("src"))
        .groupBy(col("dst"))
        .agg(sum(lit(damping) * col("trust") / col("outdeg")).as("mt"),
          sum(lit(damping) * col("pr") / col("outdeg")).as("mp"))
      r = tele.join(mass, tele("url") === mass("dst"), "left")
        .select(tele("url"),
          (lit(1.0 - damping) * col("tt") + coalesce(col("mt"), lit(0.0))).as("trust"),
          (lit(1.0 - damping) * col("tp") + coalesce(col("mp"), lit(0.0))).as("pr"))
        .localCheckpoint()
    }
    live.unpersist()
    tele.unpersist()
    r.select(col("url"), col("pr"), col("trust"),
      when(col("pr") > 0.0, (col("pr") - col("trust")) / col("pr"))
        .otherwise(lit(0.0)).as("spam_mass"))
  }
}
