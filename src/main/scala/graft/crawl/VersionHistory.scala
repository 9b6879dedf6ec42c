package graft.crawl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD-2 page version history — turn a pile of crawl OBSERVATIONS
  * (url, fetch position, content) into validity INTERVALS: one row per
  * distinct consecutive content version with [valid_from, valid_to)
  * fetch bounds, `valid_to` NULL for the live version. This is how a
  * recrawl pipeline answers "what did this page say at crawl N" without
  * storing every fetch (RecrawlDelta answers the two-snapshot diff; this
  * is its N-snapshot generalization).
  *
  * Shape: one url-keyed window pass. Fetches are fingerprinted (md5 —
  * the content string never moves after this projection), a change flag
  * via lag(), a running change count assigns version numbers, then one
  * aggregation per (url, version) takes the interval bounds and lead()
  * closes each interval with its successor's start. Two url-partitioned
  * windows + one url-version aggregation — everything co-partitioned on
  * url after a single shuffle at 100 TB (Catalyst reuses the
  * hash-partitioning across the window and the aggregation); per-url
  * state is the window frame, never a collected list.
  */
object VersionHistory {

  /** @param fetches  (keyCol, seqCol, contentCol) — seqCol orders a url's
    *                 fetches (crawl generation, fetch timestamp, ...) and
    *                 must be unique per url
    * @return (key, version, fingerprint, valid_from, valid_to) —
    *         version is 1-based per url, valid_to NULL while live */
  def intervals(fetches: DataFrame, keyCol: String, seqCol: String,
                contentCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byFetch = Window.partitionBy(keyCol).orderBy(seqCol)
    val versioned = fetches
      .select(col(keyCol), col(seqCol), md5(col(contentCol)).as("fingerprint"))
      .withColumn("_chg",
        when(lag("fingerprint", 1).over(byFetch) <=> col("fingerprint"), 0)
          .otherwise(1))
      .withColumn("version", sum("_chg").over(
        byFetch.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val perVersion = versioned.groupBy(col(keyCol), col("version"))
      .agg(min("fingerprint").as("fingerprint"), // constant within a version
        min(seqCol).as("valid_from"))
    val byVersion = Window.partitionBy(keyCol).orderBy("version")
    perVersion
      .withColumn("valid_to", lead("valid_from", 1).over(byVersion))
      .select(col(keyCol), col("version"), col("fingerprint"),
        col("valid_from"), col("valid_to"))
  }
}
