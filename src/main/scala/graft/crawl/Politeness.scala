package graft.crawl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Politeness-constrained fetch scheduling — the missing layer between
  * the frontier (q75), robots admission (q102) and crawl budgets
  * (q103/q109): every admitted URL gets a deterministic fetch slot that
  * honors its host's crawl delay (robots `Crawl-delay` / adaptive rate),
  * higher-priority URLs first within a host, and a host-affine fetcher
  * assignment (all of one host's traffic through one fetcher, so the
  * delay is enforceable process-locally — the reference's crawler
  * enforces the same per-host gap imperatively, re-queueing a URL when
  * now − lastAccess ≤ Crawl-delay·1000 (jobs/Crawler.java:127-129, delay
  * parsed at 526-547, default "1" at 512/605); this is that rule as a
  * declarative schedule).
  *
  * The schedule is pure arithmetic: seq = rank within host by
  * (priority desc, url asc), fetch_at = seq · delay(host), fetcher =
  * portable-hash(host) mod F. Integers end to end — the oracle is
  * hash-exact with no float convention.
  *
  * Scale shape: one shuffle on host for the per-host window (hosts are
  * the natural partition key of a frontier and the window is
  * frontier-per-host-sized); the delay table joins host-keyed
  * (broadcast when small); nothing global, nothing on the driver. A
  * mega-host (10⁸ queued URLs) is one partition's window — the same
  * skew AQE handles for every other host-keyed op here.
  */
object Politeness {

  /** @param frontier (url, host, priority) — admitted fetch candidates
    * @param delays   (host, delay_ms) — per-host minimum gap; hosts
    *                 absent here get `defaultDelayMs`
    * @param fetchers fetcher-slot count (host-affine assignment)
    * @return (url, host, fetcher, seq, fetch_at_ms) */
  def schedule(frontier: DataFrame, delays: DataFrame, fetchers: Int,
               defaultDelayMs: Long): DataFrame = {
    require(fetchers >= 1, s"need at least one fetcher: $fetchers")
    require(defaultDelayMs >= 0, s"negative default delay: $defaultDelayMs")
    val w = Window.partitionBy(col("host"))
      .orderBy(col("priority").desc, col("url").asc)
    frontier.select(col("url"), col("host"),
        col("priority").cast("long").as("priority"))
      .join(delays.select(col("host"),
        col("delay_ms").cast("long").as("delay_ms")), Seq("host"), "left")
      .na.fill(defaultDelayMs, Seq("delay_ms"))
      .withColumn("seq", (row_number().over(w) - 1).cast("long"))
      .select(col("url"), col("host"),
        (graft.ml.Sketches.h60(col("host")) % fetchers).cast("int").as("fetcher"),
        col("seq"), (col("seq") * col("delay_ms")).as("fetch_at_ms"))
  }
}
