package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** The block-max WAND pruned batch BM25 must change the WORK, never the
  * rows: bit-identical results to the exhaustive twin, with provably fewer
  * blocks decoded on the hot path. */
class BlockMaxSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("blockmax-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // small blocks → many blocks per term → real pruning at 1000 docs
  lazy val built: graft.index.BuiltIndex = graft.index.IndexBuild.build(
    spark, graft.corpus.Corpus.generate(spark, 1000),
    graft.corpus.Corpus.lexicon, parts = 4, blockSize = 16)

  private val queries = Seq(
    "galaxy engine search", "prince officer soldier",
    "running running galaxy", "galaxy", "prince galaxy running officer")

  private def rows(df: DataFrame): Seq[(Int, Int, String, Double)] =
    df.collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getString(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("bit-identical to the exhaustive twin at k = 1, 10, 5000") {
    for (k <- Seq(1, 10, 5000)) {
      val exhaustive = rows(QueryOps.batchBm25TopK(spark, built, queries, k))
      val pruned = rows(BlockMaxWand.batchBm25WandTopK(spark, built, queries, k))
      assert(pruned == exhaustive, s"k=$k diverged")
      assert(exhaustive.nonEmpty)
    }
  }

  test("pruning actually skips blocks on the hot path") {
    // term-at-a-time block-max pruning bites when the query's θ is not
    // swamped by OTHER terms' best-block bounds — the single-term query is
    // the clean case (θ ≈ the 10th-best seed score, far above the
    // saturated-tf tail blocks' bounds). Multi-term queries over this
    // corpus's near-uniform idfs legitimately prune little (BM25 tf
    // saturation flattens block bounds) — they are covered by the
    // bit-identity test, not this one.
    val one = Seq("galaxy")
    val (df, diag) = BlockMaxWand.instrumented(spark, built, one, k = 10)
    assert(rows(df) == rows(QueryOps.batchBm25TopK(spark, built, one, 10)))
    assert(diag.totalBlocks > 20, s"corpus too small to prove anything: $diag")
    assert(diag.decodedBlocks.value > 0)
    assert(diag.decodedBlocks.value < diag.totalBlocks,
      s"no block pruned: decoded ${diag.decodedBlocks.value} of ${diag.totalBlocks}")
    // phase 3 touches candidate-bearing blocks only — it must not regress
    // to a second exhaustive decode
    assert(diag.rescoreHitBlocks.value < diag.totalBlocks,
      s"rescore touched every block: ${diag.rescoreHitBlocks.value} of ${diag.totalBlocks}")
  }

  test("rescore plans as broadcast candidate joins, never a nested loop") {
    val df = BlockMaxWand.batchBm25WandTopK(spark, built, queries, 10)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"candidate semi-joins must stay hash joins:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the tiny candidate/dictionary sides must broadcast:\n$plan")
  }

  test("dictionary-missing and empty queries emit no rows, right schema") {
    val df = BlockMaxWand.batchBm25WandTopK(spark, built, Seq("zzzzqq xqzzy"), 10)
    assert(df.columns.toSeq == Seq("query_id", "rank", "url", "score"))
    assert(df.count() == 0)
    assert(BlockMaxWand.batchBm25WandTopK(spark, built, Seq.empty, 10).count() == 0)
  }

  test("oversized candidate sets fall back to the exhaustive twin") {
    val (df, _) = BlockMaxWand.instrumented(spark, built, queries, k = 10,
      rescoreCollectCap = 1)
    assert(rows(df) == rows(QueryOps.batchBm25TopK(spark, built, queries, 10)))
  }
}
