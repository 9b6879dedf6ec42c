package graft.rank

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.corpus.Page

/** Per-node PageRank state (url = reference-normalized node id). */
final case class RankState(url: String, rank: Double, prev: Double, links: Seq[String])

final case class PageRankResult(url: String, rank: Double)

/** The reference's PageRank as a Dataset iterative join-aggregate
  * (reference jobs/PageRank.java:18-180; invoked `0.01 80` per
  * Project/README.md §6). Algebra replicated exactly:
  *
  *  - init: self url normalized (fragment strip + default port,
  *    non-http(s) dropped), outlinks via PageRank's OWN extractor/normalizer
  *    ([[RefUrl]]), deduped; state (rank=1.0, prev=1.0);
  *  - per iteration: every node emits a keep-alive (self, 0.0) plus
  *    0.85·rank/outdeg to each outlink; contributions are summed per node;
  *    an INNER join with the previous state drops mass sent to dangling
  *    targets (urls never crawled); new rank = sum + 0.15 (flat offset, not
  *    normalized by N); prev ← old rank;
  *  - convergence: fraction of nodes with |rank − prev| < threshold ≥
  *    percent.
  *
  * Spark-native differences (behavior-preserving): the KVS-table-per-stage
  * materialization becomes persist/unpersist per iteration (+ truncated
  * lineage via localCheckpoint every `checkpointEvery` rounds, replacing the
  * reference's de-facto per-iteration table checkpointing); the string-packed
  * "rank,prev,links" state becomes a typed Dataset. Summation of double
  * contributions is associative-reordered by Spark's partial aggregation —
  * the reference's own fold order is HashMap-arrival nondeterministic, so
  * there is no canonical order to preserve; convergence uses coarse
  * thresholds (0.01) far above double-reassociation noise.
  *
  * Scale notes: contributions shuffle hash-partitions on dst url — the heavy
  * op per round; keep-alive rows ride the same shuffle. AQE handles hub-node
  * skew (a hot dst key is a sum aggregation → map-side combined). State and
  * edges stay co-partitioned across iterations because both sides of the
  * join are hash-partitioned on url by the preceding aggregation/shuffle.
  */
object PageRank {

  /** Build the initial state from pages (reference init, PageRank.java:27-70). */
  def init(spark: SparkSession, pages: Dataset[Page]): Dataset[RankState] = {
    import spark.implicits._
    pages.flatMap { p =>
      val self = RefUrl.selfNormalize(p.url)
      if (self == null) None
      else Some(RankState(self, 1.0, 1.0, RefUrl.outlinks(self, new String(p.html, "UTF-8"))))
    }
  }

  /** Run to convergence; returns (finalState, iterations). */
  def run(spark: SparkSession, state0: Dataset[RankState], threshold: Double,
          percent: Double, maxIter: Int = 100,
          checkpointEvery: Int = 5): (Dataset[PageRankResult], Int) = {
    import spark.implicits._
    var state = state0.persist(StorageLevel.MEMORY_AND_DISK)
    var cnt = 0
    var converged = false
    while (!converged && cnt < maxIter) {
      cnt += 1
      // contributions: keep-alive + 0.85*rank/outdeg per outlink
      val contribs = state.flatMap { s =>
        val keepAlive = Iterator.single((s.url, 0.0))
        val out =
          if (s.links.isEmpty) Iterator.empty
          else {
            val v = 0.85 * s.rank / s.links.length
            s.links.iterator.map(l => (l, v))
          }
        keepAlive ++ out
      }.toDF("url", "contrib")

      val aggregated = contribs.groupBy($"url").agg(sum($"contrib").as("mass"))

      // inner join drops dangling-target mass (reference PageRank.java:106)
      val newState = aggregated
        .join(state.toDF("surl", "rank", "prev", "links"), $"url" === $"surl", "inner")
        .select($"url", ($"mass" + 0.15).as("rank"), $"rank".as("prev"), $"links")
        .as[RankState]

      val next =
        (if (cnt % checkpointEvery == 0) newState.localCheckpoint(false) else newState)
          .persist(StorageLevel.MEMORY_AND_DISK)

      // one job for both convergence scalars
      val row = next.agg(
        count(lit(1)).as("total"),
        sum(when(abs($"rank" - $"prev") < threshold, 1L).otherwise(0L)).as("achieved")
      ).head()
      val total = row.getLong(0)
      val achieved = row.getLong(1)
      state.unpersist()
      state = next
      converged = total == 0 || achieved.toDouble / total >= percent
    }
    (state.map(s => PageRankResult(s.url, s.rank)), cnt)
  }

  /** Full pipeline: pages → ranks (url-keyed) with reference defaults. */
  def compute(spark: SparkSession, pages: Dataset[Page], threshold: Double = 0.01,
              percent: Double = 0.8, maxIter: Int = 100): (Dataset[PageRankResult], Int) =
    run(spark, init(spark, pages), threshold, percent, maxIter)
}
