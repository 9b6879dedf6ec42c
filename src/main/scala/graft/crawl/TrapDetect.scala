package graft.crawl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Crawl-trap detection over the frontier/seen-url log — the scheduling
  * defense the reference crawler lacks (jobs/Crawler.java fetches whatever
  * the frontier holds): calendar pages, session-id echoes and faceted
  * listings generate UNBOUNDED distinct urls from ONE page template, and
  * the crawl drowns in them. The tell is a (host, path-template) bucket
  * where the template (digit runs collapsed to 'N') holds many urls and
  * essentially every url is distinct — a finite archive re-fetches the
  * same urls, a trap never repeats one.
  *
  * Scale shape: one narrow projection (regexp template), one
  * map-side-combined agg on (host, template), top-k by TakeOrdered. The
  * url strings shuffle only within their (host, template) group key — at
  * 10¹² seen-urls this is the same shape as any host-keyed frontier agg.
  */
object TrapDetect {

  private val UrlRe = "^[a-z][a-z0-9+.-]*://([^/]+)(/.*)?$"

  /** Per (host, template) url-shape stats: n_urls, n_distinct, flagged
    * when n_urls ≥ minCount AND distinct/total ≥ minDistinctFrac.
    * Returns flagged templates ranked by (n_urls desc, host, template). */
  def urlTemplates(urls: DataFrame, urlCol: String, minCount: Long,
                   minDistinctFrac: Double = 0.99, k: Int = 100): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    urls
      .select(regexp_extract(col(urlCol), UrlRe, 1).as("host"),
        regexp_replace(coalesce(
          nullif(regexp_extract(col(urlCol), UrlRe, 2), lit("")), lit("/")),
          "[0-9]+", "N").as("template"),
        col(urlCol).as("url"))
      .filter(col("host") =!= "")
      .groupBy(col("host"), col("template"))
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("url")).as("n_distinct"))
      .filter(col("n_urls") >= minCount &&
        col("n_distinct") >= col("n_urls") * minDistinctFrac)
      .orderBy(col("n_urls").desc, col("host").asc, col("template").asc)
      .limit(k)
  }
}
