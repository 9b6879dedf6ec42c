package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25F — field-weighted BM25 (Robertson/Zaragoza), the web-ranking
  * extension the single-field reference scorer cannot express: a match in
  * the headline or anchor text counts more than the same match buried in
  * the body, with per-field length normalization so short fields aren't
  * drowned by long ones. Input is the generic field-postings relation
  * (doc_id, field, term, tf); per-term weighted tf
  *
  *   tf̃(t,d) = Σ_f  w_f · tf_f / (1 + b_f · (len_f(d)/avglen_f − 1))
  *
  * saturates ONCE across fields — score = Σ_t idf(t) · tf̃/(k1 + tf̃)
  * with the BM25+ positive idf (the q31 scorer's own formula).
  *
  * Scale shape: field lengths are one map-side-combined agg; per-field
  * average lengths and the doc count are the only driver scalars
  * (|fields| rows); the scoring joins are all pre-filtered to the query
  * terms (posting-list-sized, pushed to the scan) with the tiny df
  * dictionary broadcast; top-k is a TakeOrdered, never a global sort.
  */
object Bm25f {

  /** Top-k (doc_id, score) for `queryTerms` over `fieldTf`
    * (doc_id, field, term, tf); `weights` maps field → (w_f, b_f).
    * Fields absent from `weights` are ignored. Scores rounded 6dp
    * half-even; ties broken doc_id asc. */
  def topK(fieldTf: DataFrame, queryTerms: Seq[String],
           weights: Map[String, (Double, Double)],
           k1: Double = 1.2, k: Int = 20): DataFrame = {
    require(weights.nonEmpty, "need at least one weighted field")
    require(queryTerms.nonEmpty, "need at least one query term")
    require(k >= 1, s"k must be >= 1, got $k")
    val terms = queryTerms.map(_.toLowerCase).distinct
    val known = fieldTf.filter(col("field").isin(weights.keys.toSeq: _*))
    val flen = known.groupBy("doc_id", "field")
      .agg(sum(col("tf").cast("long")).as("flen"))
    // exact-integer sums → ONE fp division: bit-identical on any engine
    val avgs = flen.groupBy("field")
      .agg((sum(col("flen")).cast("double") / count(lit(1))).as("a"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val nDocs = known.select("doc_id").distinct().count()
    def chain(f: String => Double): Column =
      weights.keys.toSeq.sorted.foldLeft(lit(Double.NaN)) { (acc, fld) =>
        when(col("field") === fld, lit(f(fld))).otherwise(acc)
      }
    val qPostings = known.filter(col("term").isin(terms: _*))
    val wtf = qPostings
      .join(flen, Seq("doc_id", "field"))
      .select(col("doc_id"), col("term"),
        (chain(weights(_)._1) * col("tf") /
          (lit(1.0) + chain(weights(_)._2) *
            (col("flen") / chain(avgs(_)) - lit(1.0)))).as("wtf1"))
      .groupBy("doc_id", "term").agg(sum(col("wtf1")).as("wtf"))
    val dict = qPostings.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    wtf.join(broadcast(dict), "term")
      .select(col("doc_id"),
        (log((lit(nDocs.toDouble) - col("df") + 0.5) / (col("df") + 0.5)
          + 1.0) * col("wtf") / (col("wtf") + k1)).as("c"))
      .groupBy("doc_id").agg(sum(col("c")).as("raw"))
      .orderBy(col("raw").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), (bround(col("raw") * 1e6, 0) / 1e6).as("score"))
  }
}
