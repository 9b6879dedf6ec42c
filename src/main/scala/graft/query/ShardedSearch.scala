package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document-partitioned sharded serving — the way a real engine runs the
  * reference's query path (Backend.java:239-334) once one index stops
  * fitting one machine: the corpus is split into S shards by a url hash,
  * each shard generates its own per-term candidates LOCALLY (top-200 by
  * the reference's posting order, tf desc / url asc), and a merge pass
  * re-ranks the union of shard candidates into the global per-term top-200
  * before scoring. Global collection statistics (df, max-tf per term — the
  * reference scorer's IDF and TF-normalization inputs) are computed once
  * over the whole corpus and broadcast to every shard, exactly like a
  * production stats service: shard-local df would skew IDF per shard and
  * break rank identity.
  *
  * Correctness argument for the two-level candidate cut: the global top-200
  * of a term under a total order is contained in the union of per-shard
  * top-200s under the same order (each shard contributes at most 200 of the
  * global winners), so merge-then-rescore is IDENTICAL to the unsharded
  * scorer — ShardedSearchSpec asserts equality against the in-heap
  * [[Searcher]] and the driver oracle replays the unsharded SQL.
  *
  * Scale shape: the candidate windows shuffle once on (shard, term) and
  * once on term, but only QUERY-TERM postings ever move (the filter on the
  * broadcast term list is pushed into the scan); the dict agg is
  * map-side-combined; weights and stats join via broadcast. Nothing is
  * ever collected to the driver but the final ≤ k result rows.
  */
object ShardedSearch {

  /** Per-term posting cap the reference serving path applies
    * (Backend.java:262 — first 200 postings in stored order). */
  val PerTermCap = 200

  /** Score candidate postings `(url, term, tf)` with the reference scorer
    * against per-term stats `dict` `(term, df, max_tf)` computed over the
    * FULL corpus. Applies the global per-term 200-cap (tf desc, url asc),
    * the int-division log₅₀₀ IDF with its idf==0 drop, the 0.4/0.6
    * augmented TF, the per-query-term factor, and the query-order fold.
    * Returns (url, score) in rank order (score desc, url asc), ≤ k rows,
    * raw double scores. Shared by [[topK]] and
    * [[graft.index.StaticPrune]].
    *
    * `dict` is QUERY-TERM-sized by contract (≤ a handful of rows — the
    * stats-service lookup of a real serving tier), so it is collected and
    * re-broadcast as per-term LITERALS: idf is computed on the driver with
    * the searcher's own `math.log` (Spark's `log` expression goes through
    * StrictMath, which differs from Math.log by 1 ulp on some inputs —
    * enough to break the bit-identity contract with [[Searcher]]). */
  private[graft] def scoreCandidates(candidates: DataFrame, dict: DataFrame,
                                     weights: Seq[(String, Double)],
                                     numDocs: Long, k: Int): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    if (weights.isEmpty)
      return spark.emptyDataset[(String, Double)].toDF("url", "score")
    val stats = dict.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getAs[Number](2).intValue()))
      .toMap
    // idf_base is the reference's Java INT division n/df; idf==0 terms
    // (df > n/2) drop out entirely (Backend.java:283)
    val w = weights.zipWithIndex.flatMap { case ((t, f), i) =>
      stats.get(t).flatMap { case (df, maxTf) =>
        val idfBase = numDocs / df
        if (idfBase <= 1) None
        else Some((t, f, i, math.log(idfBase.toDouble) / math.log(500.0),
          maxTf))
      }
    }.toDF("term", "factor", "qidx", "idf", "max_tf")
    import org.apache.spark.sql.expressions.Window
    val perTerm = Window.partitionBy("term")
      .orderBy(col("tf").desc, col("url").asc)
    candidates
      .join(broadcast(w), "term")
      .withColumn("rnk", row_number().over(perTerm))
      .where(col("rnk") <= PerTermCap)
      // exact reference double math and grouping: (tfn * idf) * factor
      // (Backend.java:283-307 via Searcher.termTfidf)
      .withColumn("s",
        (lit(0.4) + lit(0.6) * col("tf") / col("max_tf")) *
          col("idf") * col("factor"))
      // per-url fold in QUERY-TERM order (qidx) — bit-identical to the
      // reference's sequential accumulation, immune to partition
      // reassociation (same shape as QueryOps.bm25TermOrderedFold)
      .groupBy("url")
      .agg(aggregate(sort_array(collect_list(struct(col("qidx"), col("s")))),
        lit(0.0d), (acc, x) => acc + x.getField("s")).as("score"))
      .orderBy(col("score").desc, col("url").asc)
      .limit(k)
  }

  /** Per-term global stats over the full postings table — ONE map-side-
    * combined agg, restricted to the query's terms (per-term stats depend
    * only on that term's rows, so the restriction is sound and keeps the
    * scan term-pruned). */
  private def statsOf(triples: DataFrame, terms: Seq[String]): DataFrame =
    triples.where(col("term").isin(terms: _*))
      .groupBy("term")
      .agg(count(lit(1)).as("df"), max(col("tf")).as("max_tf"))

  /** Reference-scored top-k over a document-partitioned index of `shards`
    * shards. `triples` is the postings table (url, term, tf); results are
    * rank-identical to the unsharded scorer. */
  def topK(spark: SparkSession, triples: DataFrame, numDocs: Long,
           query: String, shards: Int, k: Int = PerTermCap): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val weights = QueryOps.termWeights(query)
    import spark.implicits._
    if (weights.isEmpty)
      return spark.emptyDataset[(String, Double)].toDF("url", "score")
    val terms = weights.map(_._1)
    import org.apache.spark.sql.expressions.Window
    // shard-local candidate generation: each shard ranks ITS postings of
    // each query term and sends at most PerTermCap upward — the per-shard
    // serving work, modeled by the (shard, term) window partition
    val local = Window.partitionBy("shard", "term")
      .orderBy(col("tf").desc, col("url").asc)
    val candidates = triples
      .where(col("term").isin(terms: _*))
      .withColumn("shard", pmod(xxhash64(col("url")), lit(shards)))
      .withColumn("lrnk", row_number().over(local))
      .where(col("lrnk") <= PerTermCap)
      .select("url", "term", "tf")
    // merge + score: scoreCandidates re-applies the GLOBAL per-term cap
    // over the ≤ shards×cap merged candidates, then scores with the
    // broadcast global stats
    scoreCandidates(candidates, statsOf(triples, terms), weights, numDocs, k)
  }
}
