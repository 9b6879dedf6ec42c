package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal rank fusion (Cormack/Clarke/Büttcher 2009) — the standard
  * way to combine rankings from heterogeneous scorers (here: the
  * reference tf-idf scorer, BM25, proximity, PageRank-ordered lists)
  * without calibrating their score scales: only RANKS matter,
  * `score(q, url) = Σ_systems 1 / (k0 + rank)`.
  *
  * Determinism contract: the per-(query, url) sum folds in SYSTEM-name
  * order (sorted collect_list + aggregate), so the double accumulates in
  * one fixed order at any parallelism and the DuckDB oracle replays it
  * with the same ordered `list_reduce` fold. Final order is (fused score
  * desc, url asc) — fully pinned.
  *
  * Scale shape: one shuffle keyed (query, url) over rows that carry only
  * ids + a rank (never text or scores from the underlying indexes), then
  * a per-query window over ≤ systems × k rows. Fusing S systems' top-k
  * for Q queries shuffles S·k·Q tiny rows — independent of corpus size.
  */
object Fusion {

  /** Fuse per-system rankings. `runs`: (query_id, system, url, rank) with
    * rank 1-based within (query_id, system). Returns (query_id, url,
    * rank, rrf) — the fused top-`k` per query, rrf rounded to 6dp
    * round-even (oracle-stable). */
  def rrf(runs: DataFrame, k0: Int = 60, k: Int = 20): DataFrame = {
    require(k0 >= 1, s"k0 must be >= 1, got $k0")
    require(k >= 1, s"k must be >= 1, got $k")
    val contrib = lit(1.0) / (lit(k0.toDouble) + col("rank").cast("double"))
    val fused = runs
      .select(col("query_id"), col("system"), col("url"), contrib.as("c"))
      .groupBy("query_id", "url")
      .agg(aggregate(
        array_sort(collect_list(struct(col("system"), col("c")))),
        lit(0.0), (acc, x) => acc + x.getField("c")).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("url").asc)
    fused.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("url"), col("rank"),
        (bround(col("score") * 1e6, 0) / 1e6).as("rrf"))
  }
}
