package graft.crawl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Redirect-chain resolution over a crawl's (src → dst) redirect map —
  * the canonicalization pass between fetching and indexing: every crawled
  * url must resolve to the page that actually served content, or the
  * index splits one document's signal across its aliases. Browsers cap
  * redirect chains (~20 hops), so resolution is defined as "follow
  * exactly H hops" — well-defined even on redirect CYCLES (a real-world
  * misconfiguration that an unbounded fixpoint loop would spin on).
  *
  * Distributed shape: POINTER DOUBLING — the hop function f (dst for
  * redirect sources, identity for terminals) composes with itself each
  * round, so f^H needs log₂(H) self-joins, not H: 10¹² urls with hop cap
  * 16 resolve in 4 equi-join rounds, each shuffling (url, url) pairs
  * only. `is_terminal` reports whether the resolved url still redirects
  * (true chains end on a terminal; cycle members report false).
  */
object Redirects {

  /** Resolve every src in `redirects` (src, dst) through exactly
    * `hops` = 2^rounds hops. Returns (src, resolved, is_terminal). */
  def resolve(redirects: DataFrame, rounds: Int = 4): DataFrame = {
    require(rounds >= 1 && rounds <= 6,
      s"rounds must be in [1,6] (2^rounds hops), got $rounds")
    val r = redirects.select(col("src"), col("dst")).distinct()
    // f^1 over the domain of interest: redirect sources step to dst;
    // every REACHED url also needs an f-row (terminals: identity) so the
    // composition join stays an inner equi-join
    val domain = r.select(col("src").as("u"))
      .union(r.select(col("dst").as("u"))).distinct()
    var m = domain.join(r, domain("u") === r("src"), "left")
      .select(col("u"), coalesce(col("dst"), col("u")).as("v"))
    // square `rounds` times: f^1 → f^2 → … → f^(2^rounds)
    for (_ <- 1 to rounds) {
      // m' = m ∘ m: u -> m(m(u)); every v is in the domain, so the
      // equi-join is total
      val hop = m.select(col("u").as("_w"), col("v").as("_x"))
      m = m.join(hop, m("v") === hop("_w"))
        .select(col("u"), col("_x").as("v"))
    }
    val terminals = r.select(col("src")).distinct()
    m.join(terminals.withColumnRenamed("src", "v")
        .withColumn("_redir", lit(true)), Seq("v"), "left")
      .select(col("u").as("src"), col("v").as("resolved"),
        coalesce(!col("_redir"), lit(true)).as("is_terminal"))
  }
}
