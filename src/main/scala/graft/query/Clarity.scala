package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Query clarity score (Cronen-Townsend, Zhou & Croft, SIGIR 2002) —
  * query-performance PREDICTION: the KL divergence between the language
  * model of the query's feedback documents and the collection model,
  *
  *   clarity(q) = Σ_{w ∈ vocab(R_q)} P(w|R_q) · ln( P(w|R_q) / P(w|C) )
  *
  * (nats; the uniform-feedback-weights variant — P(w|R) is the MLE over
  * the concatenated top-N documents of the Dirichlet QL ranking, q141's
  * scorer). An unambiguous query's feedback set concentrates on topical
  * vocabulary → high KL; a query that retrieves a collection-like hodge-
  * podge scores near 0. Serving uses it to gate expensive downstream
  * passes (PRF, diversification) to the queries that need them.
  *
  * Determinism contract: feedback docs are ranked by the 6dp-ROUNDED QL
  * score with url-asc ties (q142's discipline); P ratios are single
  * divisions of exact integer counts; the per-query KL sum is unordered
  * doubles absorbed by the shared round-even-6dp convention.
  *
  * Scale shape: the QL phase is q141's grid with a query_id dimension —
  * statistics and id rows only; the feedback vocabulary is N docs' terms
  * per query (bounded by N × doc length); nothing data-sized transits
  * the driver and there is no global sort (per-query window over
  * candidate sets, TakeOrdered semantics via row_number ≤ N).
  */
object Clarity {

  /** Batch clarity over (query_id, (term, multiplicity)*) queries.
    * Returns (query_id, vocab, clarity): feedback-vocabulary size and
    * the KL in nats rounded 6dp, ordered by query_id. */
  def batch(spark: SparkSession, triples: DataFrame,
            queries: Seq[(Int, Seq[(String, Int)])],
            mu: Double, nFeedback: Int): DataFrame = {
    require(mu > 0, s"mu must be positive: $mu")
    require(nFeedback >= 1, s"nFeedback must be >= 1: $nFeedback")
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "need at least one query, each with at least one term")
    import spark.implicits._

    val qterms = queries.flatMap { case (qid, ts) =>
      ts.map { case (t, m) => (qid, t, m) }
    }.toDF("qid", "term", "qtf")

    val totalTokens = triples.agg(sum(col("tf")).cast("double")).head.getDouble(0)
    val cf = triples.join(broadcast(qterms.select("term").distinct()), Seq("term"))
      .groupBy(col("term")).agg(sum(col("tf")).cast("long").as("cf"))
    val qstats = broadcast(qterms.join(cf, Seq("term"))) // zero-cf terms drop

    // ---- phase 1: Dirichlet QL top-N per query (q141's grid + qid) ----
    val matching = triples.join(qstats.select("qid", "term"), Seq("term"))
      .select(col("qid"), col("url"), col("term"), col("tf"))
    val cand = matching.select(col("qid"), col("url")).distinct()
    val dl = triples
      .join(cand.select("url").distinct(), Seq("url"), "left_semi")
      .groupBy(col("url")).agg(sum(col("tf")).cast("long").as("dl"))

    val grid = cand.join(qstats, Seq("qid"))
      .join(matching, Seq("qid", "url", "term"), "left")
      .na.fill(0L, Seq("tf"))
      .join(dl, Seq("url"))
    val contrib = col("qtf").cast("double") *
      log((col("tf").cast("double") +
            lit(mu) * col("cf").cast("double") / lit(totalTokens)) /
          (col("dl").cast("double") + lit(mu)))
    val scored = grid.select(col("qid"), col("url"), contrib.as("c"))
      .groupBy(col("qid"), col("url"))
      .agg((bround(sum(col("c")) * 1e6, 0) / 1e6).as("score"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("url").asc)
    val fb = scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= nFeedback).select(col("qid"), col("url"))

    // ---- phase 2: feedback LM vs collection LM ----
    val rtf = triples.join(fb, Seq("url"))
      .groupBy(col("qid"), col("term"))
      .agg(sum(col("tf")).cast("long").as("rtf"))
    val rlen = rtf.groupBy(col("qid"))
      .agg(sum(col("rtf")).cast("long").as("rlen"))
    val cfv = triples
      .join(rtf.select("term").distinct(), Seq("term"), "left_semi")
      .groupBy(col("term")).agg(sum(col("tf")).cast("long").as("cfv"))

    val p = col("rtf").cast("double") / col("rlen").cast("double")
    val pc = col("cfv").cast("double") / lit(totalTokens)
    rtf.join(rlen, Seq("qid")).join(cfv, Seq("term"))
      .select(col("qid"), (p * log(p / pc)).as("kl"))
      .groupBy(col("qid"))
      .agg(count(lit(1)).cast("long").as("vocab"),
        (bround(sum(col("kl")) * 1e6, 0) / 1e6).as("clarity"))
      .select(col("qid").as("query_id"), col("vocab"), col("clarity"))
      .orderBy(col("query_id"))
  }
}
