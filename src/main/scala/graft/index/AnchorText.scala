package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Anchor-text aggregation — link inversion: for every link TARGET, the
  * inlink count and the distinct anchor terms pointing at it. The classic
  * web-search signal the reference's indexer leaves on the table (its
  * crawler extracts hrefs for PageRank only, reference
  * crawler/URLExtractor.java); target-side anchor terms are how engines
  * rank pages for words the page itself never contains.
  *
  * Extraction is regex-based on BOTH the engine and the q58 oracle side
  * (`<a href="…">text</a>`), the fragment strip is a split-at-'#' (NOT a
  * `$`-anchored regex — Java and RE2 disagree on `$` before a trailing
  * newline), and exact self-links (href == the page's own url) are
  * excluded; so the two sides stay identical by construction. URL
  * canonicalization beyond that is [[graft.rank.RefUrl]]'s job and
  * deliberately not duplicated here.
  *
  * Scale shape: extraction and tokenization are narrow codegen'd
  * projections; the inversion itself is ONE shuffle keyed by target (the
  * textbook link-inversion exchange — at 10^12 edges this is the job, and
  * it shuffles (target, term) pairs, never page HTML). A hub target's
  * term set is capped at the `maxTerms` lexicographically-first distinct
  * terms BEFORE the list is assembled (distinct + a sort-based windowed
  * rank — spill-safe — then a ≤ maxTerms-row collect), so one
  * everyone-links-here homepage cannot blow a reducer's aggregation
  * buffer. */
object AnchorText {

  private val linkPattern = """<a href="([^"]*)"[^>]*>([^<]*)</a>"""

  def aggregate(pages: DataFrame, urlCol: String, htmlCol: String,
                maxTerms: Int = 1000): DataFrame = {
    require(maxTerms > 0, s"maxTerms must be positive, got $maxTerms")
    val matches = pages.select(
      col(urlCol).as("src"),
      regexp_extract_all(col(htmlCol), lit(linkPattern), lit(1)).as("hrefs"),
      regexp_extract_all(col(htmlCol), lit(linkPattern), lit(2)).as("texts"))
    val links = matches
      .select(col("src"), explode(arrays_zip(col("hrefs"), col("texts"))).as("z"))
      .select(col("src"), substring_index(col("z.hrefs"), "#", 1).as("target"),
        col("z.texts").as("anchor"))
      .filter(col("target") =!= col("src"))
    val nLinks = links.groupBy(col("target")).agg(count(lit(1)).as("n_links"))
    val wCap = Window.partitionBy(col("target")).orderBy(col("term").asc)
    val anchorTerms = links
      .select(col("target"),
        explode(split(lower(trim(col("anchor"))), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .distinct()
      .withColumn("rn", row_number().over(wCap))
      .filter(col("rn") <= maxTerms)
      .groupBy(col("target"))
      .agg(concat_ws(",", sort_array(collect_list(col("term")))).as("anchor_terms"))
    nLinks.join(anchorTerms, Seq("target"), "left")
      .select(col("target"), col("n_links"),
        coalesce(col("anchor_terms"), lit("")).as("anchor_terms"))
  }
}
