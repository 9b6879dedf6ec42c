package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Host-collapse result diversification — the standard SERP post-rank pass
  * (at most `perHost` results from any one site, everything else pushed
  * out), applied AFTER scoring so it composes with every serving tier.
  * The reference serves raw ranked urls (Backend.java:326-334); a corpus
  * with 10⁸ hosts and one viral host would otherwise fill page one from a
  * single site.
  *
  * Deterministic: input rows carry the serving tier's `rank` (already a
  * total order — score desc, url asc); the collapse keeps each host's
  * first `perHost` rows BY THAT ORDER and re-ranks the survivors by it.
  * Operating on rank, not score, makes the pass immune to rounded-score
  * ties.
  *
  * Scale shape: one window shuffle on host over an ALREADY top-k-sized
  * input (≤ a few hundred rows per query; batch replay fans the same
  * window by query_id) — negligible next to scoring.
  */
object Diversify {

  private val HostRe = "^[a-z][a-z0-9+.-]*://([^/]+)"

  /** Collapse `results` (rank, url, …) to at most `perHost` rows per url
    * host, then take the top `k` by the original rank. Returns the
    * surviving rows re-ranked 1..n with their host. */
  def hostCollapse(results: DataFrame, perHost: Int, k: Int): DataFrame = {
    require(perHost >= 1, s"perHost must be >= 1, got $perHost")
    import org.apache.spark.sql.expressions.Window
    val byHost = Window.partitionBy("host").orderBy(col("rank").asc)
    val all = Window.orderBy(col("rank").asc)
    results
      .withColumn("host", regexp_extract(col("url"), HostRe, 1))
      .withColumn("hrnk", row_number().over(byHost))
      .where(col("hrnk") <= perHost)
      .withColumn("new_rank", row_number().over(all))
      .where(col("new_rank") <= k)
      .select(col("new_rank").as("rank"), col("url"), col("host"),
        col("score"))
  }
}
