package graft.crawl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed robots.txt admission filter — the politeness gate a
  * frontier passes through before scheduling (reference: the crawler
  * checks each candidate against its host's parsed Allow/Disallow rules,
  * jobs/Crawler.java:411-422, whose exact glob→regex semantics live in
  * [[CrawlUrl.ruleToRegex]] and are golden-tested).
  *
  * Decision: the FIRST matching rule in robots.txt order wins (idx
  * ascending); no matching rule ⇒ allowed. Shape: rules are a per-host
  * dimension — thousands of hosts × a handful of rules — so they
  * BROADCAST to the billion-row frontier and the match is a narrow
  * broadcast join + regexp, never a shuffle of the frontier; the
  * first-match pick is a map-side-combinable min_by per (host, path).
  * Rule→regex conversion runs ONCE on the rule dimension (driver-side,
  * through the golden function), not per frontier row.
  */
object RobotsFilter {

  /** @param frontier (hostCol, pathCol) candidate fetches
    * @param rules    (hostCol, "idx", "rtype" ∈ allow|disallow, "rule")
    *                 robots lines in file order per host
    * @return frontier columns + `allowed` boolean */
  def allowed(frontier: DataFrame, rules: DataFrame,
              hostCol: String = "host", pathCol: String = "path"): DataFrame = {
    val compiled = rules.select(col(hostCol), col("idx"), col("rtype"),
      col("rule")).collect() // rule dimension: small by construction
    require(compiled.nonEmpty, "empty rules — nothing to filter against")
    val badType = compiled.map(_.getString(2)).toSet -- Set("allow", "disallow")
    require(badType.isEmpty, s"unknown rule types: ${badType.mkString(", ")}")
    val spark = frontier.sparkSession
    import spark.implicits._
    val regexRules = compiled.toIndexedSeq.map(r => (r.getString(0), r.getInt(1),
      r.getString(2), CrawlUrl.ruleToRegex(r.getString(3))))
      .toDF(hostCol, "idx", "rtype", "regex")
    val m = frontier.join(broadcast(regexRules), Seq(hostCol))
      .filter(regexp_like(col(pathCol), col("regex")))
      .groupBy(col(hostCol), col(pathCol))
      .agg(min_by(col("rtype"), col("idx")).as("_first"))
    frontier.join(m, Seq(hostCol, pathCol), "left_outer")
      .withColumn("allowed",
        coalesce(col("_first") === "allow", lit(true)))
      .drop("_first")
  }
}
