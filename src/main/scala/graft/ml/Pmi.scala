package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pointwise-mutual-information related terms — the "related searches" /
  * query-expansion signal: term pairs that co-occur in documents far more
  * often than independence predicts. Document-level co-occurrence
  * (distinct presence, not positional), PMI = ln(c12·N / (c1·c2)).
  *
  * Scale shape: presence rows are DISTINCT (doc, term) — one narrow
  * distinct shuffle; the pair relation is a doc-keyed self-join of
  * presence rows with `w1 < w2`, whose size is Σ_doc |terms(doc)|² — at
  * web scale this MUST be bounded, so the join runs over the `topTerms`
  * most-frequent terms only (the standard co-occurrence-matrix cap; the
  * long tail's PMI is noise below `minPairs` anyway) and the cap is a
  * loud parameter, not a silent truncation. Counts are map-side-combined;
  * the final top-k is a TakeOrdered. */
object Pmi {

  /** Top-k (w1, w2, n_pairs, pmi) with w1 < w2, co-occurrence ≥ minPairs,
    * ranked by pmi desc (rounded 1e-6) then w1, w2 asc. */
  def relatedTerms(df: DataFrame, idCol: String, textCol: String,
                   topTerms: Int = 200, minPairs: Long = 5, k: Int = 20): DataFrame = {
    require(topTerms >= 2, s"topTerms must be >= 2, got $topTerms")
    require(k >= 1, s"k must be >= 1, got $k")
    val presence = df.select(col(idCol).cast("long").as("doc_id"),
        explode(array_distinct(filter(split(lower(trim(col(textCol))), "\\s+"),
          t => t =!= lit("")))).as("term"))
    val nDocs = df.count()
    val termDocs = presence.groupBy(col("term"))
      .agg(count(lit(1)).as("c")) // presence is distinct per doc by construction
    // the co-occurrence vocabulary cap: most-frequent terms, ties term-asc
    val top = termDocs.orderBy(col("c").desc, col("term").asc).limit(topTerms)
    val p = presence.join(broadcast(top), Seq("term"))
    val pairs = p.select(col("doc_id"), col("term").as("w1"), col("c").as("c1"))
      .join(p.select(col("doc_id"), col("term").as("w2"), col("c").as("c2")),
        Seq("doc_id"))
      .filter(col("w1") < col("w2"))
      .groupBy(col("w1"), col("w2"), col("c1"), col("c2"))
      .agg(count(lit(1)).as("n_pairs"))
      .filter(col("n_pairs") >= minPairs)
    pairs
      .select(col("w1"), col("w2"), col("n_pairs"),
        bround(log((col("n_pairs") * lit(1.0) * nDocs) /
          (col("c1") * lit(1.0) * col("c2"))) * 1e6) .divide(1e6).as("pmi"))
      .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc)
      .limit(k)
  }
}
