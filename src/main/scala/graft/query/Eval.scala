package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Offline relevance evaluation — the harness that turns a batch replay
  * ([[QueryOps.batchReferenceTopK]] / [[QueryOps.batchBm25TopK]]) plus a
  * judgment set into per-query quality metrics, the standard regression
  * gate before promoting a ranking change:
  *
  *  - NDCG@k with exponential gains (2^rel − 1) and log₂(rank+1)
  *    discounts; the ideal DCG re-ranks the query's labeled gains
  *    descending (equal gains commute, so tie order can't matter);
  *  - MRR@k over the first result at or above `relThreshold`.
  *
  * Float discipline: every per-query sum is an ORDERED fold over
  * position-discounted terms (the same sort_array/aggregate shape as the
  * scorers), so partition reassociation can't move a 1-ulp boundary, and
  * outputs round at 1e-6 like every scorer oracle.
  *
  * Scale shape: one (query_id, url) equi-join of run against labels, one
  * map-side-combined groupBy on query_id; 10⁵ queries × k rows is the
  * whole working set — trivially distributed, nothing driver-sized.
  */
object Eval {

  /** Per-query metrics over `run` (query_id, rank, url) joined with
    * `labels` (query_id, url, rel); unlabeled results count rel=0.
    * Returns (query_id, n_rel, ndcg, mrr). */
  def ndcgMrr(run: DataFrame, labels: DataFrame, k: Int = 10,
              relThreshold: Int = 2): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val log2 = log(lit(2.0))
    val joined = run.where(col("rank") <= k)
      .join(labels, Seq("query_id", "url"), "left")
      .na.fill(0, Seq("rel"))
      // exponential gain, exact integer arithmetic (1 << rel) - 1
      .withColumn("gain",
        expr("CAST(shiftleft(CAST(1 AS BIGINT), rel) - 1 AS DOUBLE)"))
    joined.groupBy("query_id")
      .agg(
        sum(when(col("rel") >= relThreshold, 1L).otherwise(0L)).as("n_rel"),
        // DCG: discount by the STORED rank, folded in rank order
        aggregate(
          transform(sort_array(collect_list(struct(col("rank"), col("gain")))),
            x => x.getField("gain") /
              (log(x.getField("rank").cast("double") + 1.0) / log2)),
          lit(0.0d), (a, b) => a + b).as("dcg"),
        // IDCG: gains re-sorted descending, discount by POSITION (equal
        // gains commute under any tie order)
        aggregate(
          transform(reverse(sort_array(collect_list(col("gain")))),
            (g, i) => g / (log(i.cast("double") + 2.0) / log2)),
          lit(0.0d), (a, b) => a + b).as("idcg"),
        min(when(col("rel") >= relThreshold, col("rank"))).as("first_rel"))
      .select(col("query_id"), col("n_rel"),
        bround(when(col("idcg") > 0.0, col("dcg") / col("idcg"))
          .otherwise(0.0) * 1e6).divide(1e6).as("ndcg"),
        bround(when(col("first_rel").isNotNull,
          lit(1.0) / col("first_rel")).otherwise(0.0) * 1e6)
          .divide(1e6).as("mrr"))
  }
}
