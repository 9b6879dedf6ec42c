package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Host facet counts over a batch SERP — the "results by site" sidebar a
  * search frontend renders next to the ranked list (the reference serves
  * raw ranked urls only, Backend.java:326-334; any UI over a web-scale
  * corpus needs the per-site rollup). Input is the serving tier's batch
  * output (qid, rank, url, score); output is each query's top facets
  * with a deterministic total order.
  *
  * Scale shape: one map-side-combined groupBy on (qid, host) — the input
  * is already top-k-sized per query, so the window that ranks facets
  * partitions by qid over at most k rows each; nothing global.
  */
object Facets {

  private val HostRe = "^[a-z][a-z0-9+.-]*://([^/]+)"

  /** Top `k` host facets per query: (qid, host, n_results, best_rank,
    * facet_rank), facets ordered by (n_results desc, best_rank asc,
    * host asc). */
  def hostFacets(results: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val agg = results
      .withColumn("host", regexp_extract(col("url"), HostRe, 1))
      .groupBy("qid", "host")
      .agg(count(lit(1)).as("n_results"), min(col("rank")).as("best_rank"))
    val w = Window.partitionBy("qid")
      .orderBy(col("n_results").desc, col("best_rank").asc, col("host").asc)
    agg.withColumn("facet_rank", row_number().over(w))
      .where(col("facet_rank") <= k)
  }
}
