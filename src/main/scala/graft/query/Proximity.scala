package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Term-proximity ranking — the classic "how close do the two query terms
  * appear" relevance feature (Büttcher/Clarke-style span evidence) the
  * tf-only reference scorer cannot compute. Documents containing both
  * terms rank by the minimum token distance between any occurrence pair.
  *
  * Scale shape: positions are grouped to ONE row per (doc, term) BEFORE
  * the join — the doc_id equi-join of two term-filtered single-row-per-doc
  * relations, so the shuffle never carries the tf_a×tf_b occurrence-pair
  * explosion a naive position join would (a stopword pair at web scale
  * would square every document's postings). The min distance itself is a
  * LINEAR merged-scan over the two sorted position lists, expressed as
  * codegen-friendly higher-order functions (array_sort over tagged
  * positions + one aggregate() fold), not a UDF. Top-k is a TakeOrdered.
  */
object Proximity {

  private val Inf = Int.MaxValue

  /** Min token distance between any `termA` and `termB` occurrence, per
    * document containing BOTH: (doc_id, min_dist), top-k by
    * (min_dist asc, doc_id asc). `positionsDf` is
    * [[PhraseSearch.positions]]'s (doc_id, pos, term) relation. */
  def topK(positionsDf: DataFrame, termA: String, termB: String,
           k: Int): DataFrame = {
    val (ta, tb) = (termA.toLowerCase, termB.toLowerCase)
    require(ta != tb, s"terms must differ, got '$ta' twice")
    require(k >= 1, s"k must be >= 1, got $k")
    def grouped(t: String, out: String) =
      positionsDf.filter(col("term") === t)
        .groupBy("doc_id")
        .agg(collect_list(col("pos").cast("int")).as(out))
    val joined = grouped(ta, "pa").join(grouped(tb, "pb"), "doc_id")
    // one ascending stream of (position, whichTerm); min gap to the most
    // recent opposite-tagged position equals the global min |pa - pb|
    val tagged = array_sort(concat(
      transform(col("pa"), p => struct(p.as("p"), lit(0).as("t"))),
      transform(col("pb"), p => struct(p.as("p"), lit(1).as("t")))))
    val zero = struct(lit(-1).as("la"), lit(-1).as("lb"), lit(Inf).as("best"))
    def fold(acc: Column, x: Column): Column = {
      val (p, t) = (x.getField("p"), x.getField("t"))
      val cand = when(t === 0 && acc.getField("lb") >= 0, p - acc.getField("lb"))
        .when(t === 1 && acc.getField("la") >= 0, p - acc.getField("la"))
        .otherwise(lit(Inf))
      struct(
        when(t === 0, p).otherwise(acc.getField("la")).as("la"),
        when(t === 1, p).otherwise(acc.getField("lb")).as("lb"),
        least(acc.getField("best"), cand).as("best"))
    }
    joined
      .select(col("doc_id"),
        aggregate(tagged, zero, fold, _.getField("best")).as("min_dist"))
      .orderBy(col("min_dist").asc, col("doc_id").asc)
      .limit(k)
  }
}
