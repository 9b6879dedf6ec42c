package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Positional phrase search — the "exact phrase" query operator the
  * tf-only reference index cannot answer (its postings carry no
  * positions; `jobs/Indexer.java` emits (term, url, tf) — cited in
  * SURVEY §2.2). Documents are ranked by how often the exact token
  * sequence occurs.
  *
  * Implementation is the classic positional-posting intersection: one
  * (doc, position, term) relation; the i-th phrase term's postings are
  * shifted to their implied phrase START (`pos - i`) and intersected with
  * an equi-join on (doc_id, start) — m terms → m−1 joins, each keyed on
  * the composite, each side pre-filtered to ONE term's postings (the
  * `term = …` predicate pushes to the scan/projection, so join inputs are
  * posting-list-sized, not corpus-sized). Survivor starts are exact
  * phrase occurrences; top-k is a TakeOrdered, never a global sort.
  *
  * At index scale the same algebra runs over a persisted positional
  * posting table partitioned by term — the joins then co-locate by
  * (doc, start) with the rarest term first; this module takes the
  * relation as input so both the ad-hoc (tokenize-on-read) and indexed
  * paths share it. */
object PhraseSearch {

  /** (doc_id, pos, term) positions of `textCol`'s whitespace tokens,
    * lowercased, 0-based dense positions. */
  def positions(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
        posexplode(filter(split(lower(trim(col(textCol))), "\\s+"),
          t => t =!= lit(""))).as(Seq("pos", "term")))

  /** Top-k documents by exact-phrase occurrence count (count desc, doc_id
    * asc ties); docs with zero occurrences emit no row. */
  def topK(positionsDf: DataFrame, phrase: Seq[String], k: Int): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    require(k >= 1, s"k must be >= 1, got $k")
    val terms = phrase.map(_.toLowerCase)
    val starts = terms.zipWithIndex.map { case (t, i) =>
      positionsDf.filter(col("term") === t)
        .select(col("doc_id"), (col("pos") - i).as("start"))
    }
    val occ = starts.reduce((a, b) => a.join(b, Seq("doc_id", "start")))
    occ.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("doc_id").asc)
      .limit(k)
  }
}
