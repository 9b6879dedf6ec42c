package graft.crawl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tracking-parameter URL canonicalization — the recrawl-dedup pass that
  * collapses `page?utm_source=x&id=3`, `page?id=3&utm_campaign=y` and
  * `page?id=3#frag` into one canonical spelling before content even gets
  * fetched (every spelling would otherwise crawl, index and dedup as a
  * separate document). Distinct from [[CrawlUrl]]'s reference-exact
  * normalizer (scheme/host/port/path quirks, golden-tested) and from
  * [[Redirects]] (server-side aliasing): this pass is pure client-side
  * query-string hygiene.
  *
  * Canonical form: fragment dropped, tracking parameters (utm_* plus the
  * usual click-id suspects) dropped, surviving parameters SORTED (byte
  * order) so parameter order doesn't split a group, base kept verbatim.
  * Built entirely from string/array built-ins (split, list filter/sort,
  * join) — no regex, so any engine replays it byte-identically.
  *
  * Scale shape: a narrow codegen'd projection; the keeper election is one
  * map-side-combined min per canonical group — the shuffle carries
  * (canonical, url) strings only.
  */
object CanonicalUrl {

  /** Exact-name tracking params dropped in addition to the utm_ prefix. */
  val TrackingNames: Seq[String] =
    Seq("fbclid", "gclid", "msclkid", "ref", "mc_cid", "mc_eid")

  /** The canonical spelling of `url` as a column expression. */
  def canonicalize(url: Column): Column = {
    val noFrag = substring_index(url, "#", 1)
    val base = substring_index(noFrag, "?", 1)
    val qpos = instr(noFrag, "?")
    val query = when(qpos > 0, noFrag.substr(qpos + 1, lit(1 << 20)))
      .otherwise(lit(""))
    val kept = array_sort(filter(split(query, "&"), p => {
      val name = substring_index(p, "=", 1)
      !name.startsWith("utm_") && !name.isin(TrackingNames: _*) &&
        !(p === lit(""))
    }))
    when(size(kept) > 0, concat(base, lit("?"), array_join(kept, "&")))
      .otherwise(base)
  }

  /** (url, canonical, keeper): every input url with its canonical form and
    * the group's elected keeper (min url — deterministic, order-free). */
  def withKeeper(urls: DataFrame, urlCol: String): DataFrame = {
    val mapped = urls.select(col(urlCol).as("url"),
      canonicalize(col(urlCol)).as("canonical"))
    val keepers = mapped.groupBy("canonical").agg(min(col("url")).as("keeper"))
    mapped.join(keepers, "canonical").select("url", "canonical", "keeper")
  }
}
