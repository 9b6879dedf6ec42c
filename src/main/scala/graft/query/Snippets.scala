package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic result-page snippet extraction: for each document, the
  * best `windowTokens`-token window — the one containing the most query-
  * term hits, earliest window on ties — plus its hit count and start
  * offset. The serving piece next to title/url on a result page; the
  * reference's Backend returns bare urls (backend/Backend.java:139), so
  * this is capability the rebuild adds, defined exactly enough to oracle.
  *
  * Scale shape: entirely NARROW — tokenize, one explode over window starts
  * (rows ∝ tokens), a per-doc min over a packed (−hits, start, snippet)
  * struct (map-side combined). No join, no driver state; the snippet
  * string is assembled inside the row, so text leaves the executor only as
  * the ≤ windowTokens-token result. Documents with fewer tokens than the
  * window emit their whole text as the single candidate window. */
object Snippets {

  def bestWindow(df: DataFrame, idCol: String, textCol: String,
                 queryTerms: Seq[String], windowTokens: Int = 15): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(windowTokens > 0, s"windowTokens must be positive, got $windowTokens")
    val spark = df.sparkSession
    import spark.implicits._
    val qs = queryTerms.map(_.toLowerCase).distinct
    val toks: Column = filter(split(trim(col(textCol)), "\\s+"), t => t =!= lit(""))
    val base = df.select(col(idCol).cast("long").as("doc_id"), toks.as("toks"))
      .filter(size($"toks") > 0)
    // one row per candidate window start (0-based; short docs → one window)
    val starts = base.select($"doc_id", $"toks",
      explode(sequence(lit(0), greatest(size($"toks") - windowTokens, lit(0)))).as("start"))
    val win = slice($"toks", $"start" + 1, lit(windowTokens))
    val hits = size(filter(win, t => array_contains(
      array(qs.map(lit): _*), lower(t))))
    val cand = starts.select($"doc_id",
      struct((-hits).as("neg_hits"), $"start",
        array_join(win, " ").as("snippet")).as("c"))
    cand.groupBy($"doc_id")
      .agg(min($"c").as("best"))
      .select($"doc_id", (-$"best.neg_hits").as("hits"),
        $"best.start".as("start"), $"best.snippet".as("snippet"))
  }
}
