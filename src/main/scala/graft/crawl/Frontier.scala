package graft.crawl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Politeness-aware crawl-frontier scheduling: each candidate URL gets a
  * fetch `wave` — its position in its host's priority queue — so a crawler
  * issuing one request per host per wave respects per-host politeness while
  * the whole frontier advances in parallel across hosts.
  *
  * The reference crawler serializes politeness through per-host in-memory
  * queues on each worker (Crawler's frontier tables); declaratively, the
  * per-host queue IS a window: `row_number() over (partition by host order
  * by priority desc, url asc)`, capped at the per-host crawl budget.
  *
  * Scale shape: one shuffle on host; each host's sort is its own politeness
  * queue (range-partitioned, spillable), and the budget cap bounds the
  * output per host. A mega-host (10^8 known urls, budget 10^4) is the skew
  * case: AQE splits the oversized sort partitions, and since only the
  * top-`maxPerHost` rows survive, a planet-scale run should pre-prune with
  * a per-host approximate count-min top-k before the exact window — the cap
  * makes that pre-prune lossless for every host under budget.
  */
object Frontier {

  /** (url, host, priority..., wave) for the top-`maxPerHost` urls per host,
    * highest priority first (url-asc ties). */
  def schedule(urls: DataFrame, urlCol: String, priorityCol: String,
               maxPerHost: Int): DataFrame = {
    require(maxPerHost > 0, s"maxPerHost must be positive: $maxPerHost")
    val w = Window.partitionBy("host")
      .orderBy(col(priorityCol).desc, col(urlCol).asc)
    urls
      .withColumn("host", regexp_extract(col(urlCol), "^https?://([^/:]+)", 1))
      .withColumn("wave", row_number().over(w))
      .filter(col("wave") <= maxPerHost)
  }
}
