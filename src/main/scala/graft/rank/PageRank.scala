package graft.rank

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.corpus.Page

/** Per-node PageRank state (url = reference-normalized node id). */
final case class RankState(url: String, rank: Double, prev: Double, links: Seq[String])

/** [[PageRank.runHashed]] state: 64-bit hashed node ids instead of url
  * strings — the per-round shuffle carries 8-byte keys, not ~60-byte urls. */
final case class HashedRankState(id: Long, rank: Double, prev: Double, links: Array[Long])

/** [[PageRank.runHashed128]] state: 128-bit hashed node ids as (hi, lo)
  * limb pairs — 16-byte shuffle keys, collision-safe past the 64-bit
  * family's ~10^11-key cliff (expected collisions ≈ n²/2^129: ~10^-15 at
  * 10^7 nodes, still ≪ 1 at the north rule's 10^12). */
final case class Hashed128RankState(id: (Long, Long), rank: Double, prev: Double,
                                    links: Array[(Long, Long)])

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

  /** Build the initial state from pages (reference init, PageRank.java:27-70).
    *
    * Two crawled urls can self-normalize to the SAME node (e.g. an explicit
    * `:80` twin); the reference's KVS `saveAsTable` collapses same-key rows
    * last-write-wins (arrival-order nondeterministic). Without collapsing,
    * the iterate inner join fans out per duplicate and double-counts mass —
    * so duplicates are reduced to ONE row here, pinned deterministically to
    * the lexicographically-smallest original url (our runs must be
    * reproducible at any parallelism; the reference's winner is arbitrary). */
  def init(spark: SparkSession, pages: Dataset[Page]): Dataset[RankState] = {
    import spark.implicits._
    pages.flatMap { p =>
      val self = RefUrl.selfNormalize(p.url)
      if (self == null) None
      else Some((self, p.url, RefUrl.outlinks(self, new String(p.html, "UTF-8"))))
    }
      .groupByKey(_._1)
      .reduceGroups((a, b) => if (a._2 <= b._2) a else b)
      .map { case (_, (self, _, links)) => RankState(self, 1.0, 1.0, links) }
  }

  /** Run to convergence; returns (finalState, iterations).
    *
    * `checkpointDir`: None → `localCheckpoint` (fast, but executor-local —
    * an executor loss on a real cluster loses partitions). Pass a reliable
    * dir (HDFS/S3 in production) to truncate lineage with durable
    * `checkpoint()` instead — the right setting for the 100 TB story. */
  def run(spark: SparkSession, state0: Dataset[RankState], threshold: Double,
          percent: Double, maxIter: Int = 100,
          checkpointEvery: Int = 5,
          checkpointDir: Option[String] = None): (Dataset[PageRankResult], Int) = {
    import spark.implicits._
    val (state, cnt) = converge[RankState, String](spark, state0, "url",
      s => contribsOf(s.url, s.rank, s.links),
      threshold, percent, maxIter, checkpointEvery, checkpointDir)
    (state.map(s => PageRankResult(s.url, s.rank)), cnt)
  }

  /** WARM-START (incremental) iteration — the production recompute after
    * a recrawl changes the graph: instead of re-converging from the flat
    * rank=1.0 init, seed the NEW graph's nodes with the previous run's
    * ranks (nodes new to the graph start at the reference init 1.0) and
    * iterate the same algebra. PageRank's fixpoint is init-independent,
    * so a warm start converges in far fewer rounds when the graph delta
    * is small — at 10¹² pages that is the difference between an hourly
    * and a daily rank refresh. One url-keyed left join to seed, then the
    * shared converge loop. */
  def warmStart(spark: SparkSession, newState: Dataset[RankState],
                prev: Dataset[PageRankResult], threshold: Double,
                percent: Double, maxIter: Int = 100,
                checkpointEvery: Int = 5,
                checkpointDir: Option[String] = None): (Dataset[PageRankResult], Int) = {
    import spark.implicits._
    val seeded = newState.toDF()
      .join(prev.toDF().select($"url", $"rank".as("_prev_rank")), Seq("url"), "left")
      .select($"url",
        coalesce($"_prev_rank", lit(1.0)).as("rank"),
        coalesce($"_prev_rank", lit(1.0)).as("prev"),
        $"links")
      .as[RankState]
    run(spark, seeded, threshold, percent, maxIter, checkpointEvery, checkpointDir)
  }

  /** Keep-alive + 0.85·rank/outdeg per outlink — one node's contribution
    * rows (reference PageRank.java:90-104), generic over the key type. */
  private def contribsOf[K](key: K, rank: Double, links: Seq[K]): Iterator[(K, Double)] = {
    val keepAlive = Iterator.single((key, 0.0))
    val out =
      if (links.isEmpty) Iterator.empty
      else {
        val v = 0.85 * rank / links.length
        links.iterator.map(l => (l, v))
      }
    keepAlive ++ out
  }

  /** The ONE convergence loop [[run]] and [[runHashed]] share — identical
    * algebra over a generic node-key type (url strings / 64-bit hashes).
    * State rows must be (key, rank, prev, links); `keyName` is S's key
    * field so the round's DataFrame can land back in `.as[S]`.
    *
    * Per round: contribution shuffle + sum, dangling-drop inner join
    * (reference PageRank.java:106), +0.15; ONE action computes both
    * convergence scalars and materializes the persisted round (bounding
    * plan depth to one iteration). Reliable-checkpoint rounds persist
    * BEFORE checkpointing so the checkpoint-writer job reads the round
    * from cache instead of re-executing it (the pre-checkpoint cache is
    * dropped once the files exist); localCheckpoint rounds keep the
    * persist-after shape — local checkpoints ARE the cached blocks. The
    * caller's state0 cache is adopted, never evicted. */
  private def converge[S, K](spark: SparkSession, state0: Dataset[S],
      keyName: String, toContribs: S => Iterator[(K, Double)],
      threshold: Double, percent: Double, maxIter: Int,
      checkpointEvery: Int, checkpointDir: Option[String])(
      implicit se: org.apache.spark.sql.Encoder[S],
      ke: org.apache.spark.sql.Encoder[(K, Double)]): (Dataset[S], Int) = {
    import spark.implicits._
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    // each round reads `state` twice (contribs flatMap + the join), so the
    // initial state is persisted — but only when the CALLER hasn't already:
    // the loop unpersists the states it owns, and dropping a cache the
    // caller set up (e.g. one init reused across run/runHashed) would
    // silently force their pipeline to recompute cold
    val adoptState0 = state0.storageLevel == StorageLevel.NONE
    var state = if (adoptState0) state0.persist(StorageLevel.MEMORY_AND_DISK) else state0
    var ownState = adoptState0
    var cnt = 0
    var converged = false
    while (!converged && cnt < maxIter) {
      cnt += 1
      val contribs = state.flatMap(toContribs).toDF("k", "contrib")
      val aggregated = contribs.groupBy($"k").agg(sum($"contrib").as("mass"))
      // inner join drops dangling-target mass (reference PageRank.java:106)
      val newState = aggregated
        .join(state.toDF("sk", "rank", "prev", "links"), $"k" === $"sk", "inner")
        .select($"k".as(keyName), ($"mass" + 0.15).as("rank"), $"rank".as("prev"), $"links")
        .as[S]

      var preCheckpointCache: Option[Dataset[S]] = None
      val next =
        if (cnt % checkpointEvery == 0 && checkpointDir.isDefined) {
          val cached = newState.persist(StorageLevel.MEMORY_AND_DISK)
          preCheckpointCache = Some(cached)
          cached.checkpoint(false)
        } else if (cnt % checkpointEvery == 0) {
          newState.localCheckpoint(false).persist(StorageLevel.MEMORY_AND_DISK)
        } else newState.persist(StorageLevel.MEMORY_AND_DISK)

      // convergence scalars ride ACCUMULATORS on the materialization action
      // instead of a separate aggregation: the old agg appended a partial +
      // single-partition-final exchange pair to every round's job (~2 of its
      // ~5 AQE stages for pure scheduling). foreach is an action, so
      // accumulator updates are exactly-once per successful task; the
      // per-row predicate is the same IEEE |rank − prev| < threshold.
      val totalAcc = spark.sparkContext.longAccumulator
      val achievedAcc = spark.sparkContext.longAccumulator
      val th = threshold
      next.toDF().select($"rank", $"prev").foreach { r =>
        totalAcc.add(1L)
        if (math.abs(r.getDouble(0) - r.getDouble(1)) < th) achievedAcc.add(1L)
      }
      val total = totalAcc.value
      val achieved = achievedAcc.value
      preCheckpointCache.foreach(_.unpersist())
      if (ownState) state.unpersist()
      state = next
      ownState = true
      converged = total == 0 || achieved.toDouble / total >= percent
    }
    (state, cnt)
  }

  /** Full pipeline: pages → ranks (url-keyed) with reference defaults. */
  def compute(spark: SparkSession, pages: Dataset[Page], threshold: Double = 0.01,
              percent: Double = 0.8, maxIter: Int = 100): (Dataset[PageRankResult], Int) =
    run(spark, init(spark, pages), threshold, percent, maxIter)

  /** The node-id hash for [[runHashed]] — the shared [[graft.util.Fnv]]
    * 64-bit FNV-1a family. */
  def fnv1a64(s: String): Long = graft.util.Fnv.hash64(s)

  /** Same algebra as [[run]] with 64-bit-hashed node ids: the per-round
    * shuffle (the heavy op) carries 8-byte keys instead of url strings —
    * ~5-10× smaller shuffle rows on realistic url lengths. Ranks are
    * identical to [[run]] modulo double-summation reassociation (which both
    * paths already have). A hash collision would merge two nodes, so ids are
    * verified collision-free up front and the job fails loudly otherwise
    * (expected collisions ≈ n²/2^65: ~0.03 at 10^9 nodes; beyond 10^11 nodes
    * switch the id to 128 bits). Final output maps ids back to urls. */
  def runHashed(spark: SparkSession, state0: Dataset[RankState], threshold: Double,
                percent: Double, maxIter: Int = 100, checkpointEvery: Int = 5,
                checkpointDir: Option[String] = None): (Dataset[PageRankResult], Int) = {
    import spark.implicits._
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    // persisted: the id map, the collision check, and the hashed-state
    // derivation below all read it — without the cache the whole upstream
    // init pipeline (page scan, link extraction) executes once per consumer
    // adopt the caller's cache if they set one up (see run())
    val adoptSrc = state0.storageLevel == StorageLevel.NONE
    val src = if (adoptSrc) state0.persist(StorageLevel.MEMORY_AND_DISK) else state0
    // materialized (count) while src is still cached, so the final id→url
    // join never re-runs the upstream init pipeline cold
    val ids = src.map(s => (fnv1a64(s.url), s.url)).toDF("id", "url")
      .persist(StorageLevel.MEMORY_AND_DISK)
    ids.count()
    // collision check covers NODES AND LINK TARGETS: a dangling target that
    // collides with a node would silently inject mass every iteration (the
    // string-keyed run() drops it via the inner join), so the loud-failure
    // guarantee must hold over every url whose hash enters the shuffle
    val allUrls = src.flatMap(s => Iterator.single(s.url) ++ s.links.iterator).distinct()
    val nUrls = allUrls.count()
    val nIds = allUrls.map(fnv1a64).distinct().count()
    require(nIds == nUrls,
      s"fnv1a64 id collision: $nUrls urls -> $nIds ids; use runHashed128 at this scale")

    val hashed0 = src
      .map(s => HashedRankState(fnv1a64(s.url), s.rank, s.prev, s.links.map(fnv1a64).toArray))
    val (state, cnt) = converge[HashedRankState, Long](spark, hashed0, "id",
      s => contribsOf(s.id, s.rank, s.links.toIndexedSeq),
      threshold, percent, maxIter, checkpointEvery, checkpointDir)
    if (adoptSrc) src.unpersist()
    // eager localCheckpoint materializes the joined output so the ids cache
    // can be released HERE instead of leaking for the session lifetime (the
    // loop is already action-per-round eager — this adds one job over two
    // cached inputs; same discipline as TextAnalysis.packSequences)
    val out = state.toDF("id", "rank", "prev", "links")
      .join(ids, Seq("id"))
      .select($"url", $"rank").as[PageRankResult]
      .localCheckpoint()
    ids.unpersist()
    (out, cnt)
  }

  /** The 128-bit node-id hash — [[graft.util.Fnv.hash128]] as (hi, lo). */
  def fnv1a128(s: String): (Long, Long) = graft.util.Fnv.hash128(s)

  /** [[runHashed]] past the 64-bit cliff: identical algebra through the SAME
    * generic [[converge]] loop, keyed on 128-bit FNV-1a ids (a (hi, lo)
    * struct — 16-byte shuffle keys, still ~4× smaller than realistic urls).
    * This is the documented answer to "use 128-bit ids at this scale": at
    * 10^12 nodes the 64-bit family expects ~27 collisions while this one
    * expects ~10^-15. The up-front guard is kept as a cheap invariant (two
    * map-side-combined distinct counts) and the failure stays loud. */
  def runHashed128(spark: SparkSession, state0: Dataset[RankState], threshold: Double,
                   percent: Double, maxIter: Int = 100, checkpointEvery: Int = 5,
                   checkpointDir: Option[String] = None): (Dataset[PageRankResult], Int) = {
    import spark.implicits._
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    val adoptSrc = state0.storageLevel == StorageLevel.NONE
    val src = if (adoptSrc) state0.persist(StorageLevel.MEMORY_AND_DISK) else state0
    val ids = src.map(s => (fnv1a128(s.url), s.url)).toDF("id", "url")
      .persist(StorageLevel.MEMORY_AND_DISK)
    ids.count() // materialize while src is cached (see runHashed)
    val allUrls = src.flatMap(s => Iterator.single(s.url) ++ s.links.iterator).distinct()
    val nUrls = allUrls.count()
    val nIds = allUrls.map(fnv1a128).distinct().count()
    require(nIds == nUrls,
      s"fnv1a128 id collision: $nUrls urls -> $nIds ids")

    val hashed0 = src.map(s =>
      Hashed128RankState(fnv1a128(s.url), s.rank, s.prev, s.links.map(fnv1a128).toArray))
    val (state, cnt) = converge[Hashed128RankState, (Long, Long)](spark, hashed0, "id",
      s => contribsOf(s.id, s.rank, s.links.toIndexedSeq),
      threshold, percent, maxIter, checkpointEvery, checkpointDir)
    if (adoptSrc) src.unpersist()
    val out = state.toDF("id", "rank", "prev", "links")
      .join(ids, Seq("id"))
      .select($"url", $"rank").as[PageRankResult]
      .localCheckpoint() // eager: lets the ids cache release (see runHashed)
    ids.unpersist()
    (out, cnt)
  }
}
