package graft.crawl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recrawl snapshot delta: classify every key across two corpus snapshots
  * as `added` / `removed` / `changed` / `unchanged` by content fingerprint.
  *
  * This is the op that makes a daily recrawl incremental: downstream the
  * indexer re-tokenizes only the added/changed keys (StreamIngest's
  * last-write-wins merge absorbs them), instead of rebuilding from the full
  * corpus. The reference engine has no notion of this — its crawler
  * re-fetches and its indexer re-runs whole tables.
  *
  * Scale shape: each side is reduced to (key, 128-bit md5) BEFORE the
  * full-outer join, so the shuffle carries ~50 bytes per row — never page
  * text or html. At 10^12 rows, store both snapshots bucketed by key and
  * the join degenerates to a zero-shuffle sort-merge per bucket.
  */
object RecrawlDelta {

  /** One row per key present in either snapshot: (key, status). */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, key: String,
           text: String): DataFrame = {
    // presence is a flag, NOT fingerprint-nullness: a NULL text hashes to
    // a NULL md5, and classifying on that would call a key present in both
    // snapshots "added"; the null-safe <=> keeps NULL-vs-NULL "unchanged"
    val o = oldSnap.select(col(key).as("_k"), md5(col(text)).as("_ofp"),
      lit(true).as("_oin"))
    val n = newSnap.select(col(key).as("_k"), md5(col(text)).as("_nfp"),
      lit(true).as("_nin"))
    o.join(n, Seq("_k"), "full_outer")
      .select(col("_k").as(key),
        when(col("_oin").isNull, lit("added"))
          .when(col("_nin").isNull, lit("removed"))
          .when(col("_ofp") <=> col("_nfp"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }
}
