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
    val trust = Personalized.run(spark, nodes, edges, trusted, iters, damping)
      .withColumnRenamed("rank", "trust")
    val pr = Personalized.run(spark, nodes, edges, nodes.select(col("url")),
        iters, damping)
      .withColumnRenamed("rank", "pr")
    pr.join(trust, Seq("url"))
      .select(col("url"), col("pr"), col("trust"),
        when(col("pr") > 0.0, (col("pr") - col("trust")) / col("pr"))
          .otherwise(lit(0.0)).as("spam_mass"))
  }
}
