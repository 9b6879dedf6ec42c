package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Anchor-text aggregation — link inversion: for every link TARGET, the
  * inlink count and the distinct anchor terms pointing at it. The classic
  * web-search signal the reference's indexer leaves on the table (its
  * crawler extracts hrefs for PageRank only, reference
  * crawler/URLExtractor.java); target-side anchor terms are how engines
  * rank pages for words the page itself never contains.
  *
  * Extraction is regex-based on BOTH the engine and the q58 oracle side
  * (`<a href="…">text</a>`, fragment stripped), so the two stay identical
  * by construction; URL canonicalization beyond the fragment strip is
  * [[graft.rank.RefUrl]]'s job and deliberately not duplicated here.
  *
  * Scale shape: extraction and tokenization are narrow codegen'd
  * projections; the inversion itself is ONE shuffle keyed by target (the
  * textbook link-inversion exchange — at 10^12 edges this is the job, and
  * it shuffles (target, term) pairs, never page HTML). A hub target's
  * term set is capped at `maxTerms` sorted-distinct terms (collect_set is
  * map-side combined; the cap bounds the reduce-side row), so one
  * everyone-links-here homepage cannot blow a reducer. */
object AnchorText {

  private val linkPattern = """<a href="([^"]*)"[^>]*>([^<]*)</a>"""

  def aggregate(pages: DataFrame, urlCol: String, htmlCol: String,
                maxTerms: Int = 1000): DataFrame = {
    require(maxTerms > 0, s"maxTerms must be positive, got $maxTerms")
    val matches = pages.select(
      regexp_extract_all(col(htmlCol), lit(linkPattern), lit(1)).as("hrefs"),
      regexp_extract_all(col(htmlCol), lit(linkPattern), lit(2)).as("texts"))
    val links = matches
      .select(explode(arrays_zip(col("hrefs"), col("texts"))).as("z"))
      .select(regexp_replace(col("z.hrefs"), "#.*$", "").as("target"),
        col("z.texts").as("anchor"))
    val nLinks = links.groupBy(col("target")).agg(count(lit(1)).as("n_links"))
    val anchorTerms = links
      .select(col("target"),
        explode(split(lower(trim(col("anchor"))), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("target"))
      .agg(concat_ws(",", slice(sort_array(collect_set(col("term"))), 1, maxTerms))
        .as("anchor_terms"))
    nLinks.join(anchorTerms, Seq("target"), "left")
      .select(col("target"), col("n_links"),
        coalesce(col("anchor_terms"), lit("")).as("anchor_terms"))
  }
}
