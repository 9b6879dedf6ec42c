package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE tokenizer training — the merge-learning inner loop (Sennrich et
  * al., ACL 2016) every modern LLM tokenizer runs over its corpus: count
  * adjacent symbol pairs (weighted by word frequency), merge the most
  * frequent pair everywhere, repeat. The learned merge list IS the
  * tokenizer; this is the op that turns a 100 TB corpus into one.
  *
  * Words are space-joined symbol strings ("l o w", freq) — re-segmentation
  * is a LEFT-TO-RIGHT fold over the symbols that appends the right symbol
  * WITHOUT a space when the last token equals the merge's left side
  * (token-boundary-exact: ends_with(acc, " l") cannot false-positive on a
  * token merely ending in l, because the space pins the boundary). That
  * fold reproduces greedy non-overlapping BPE exactly: [a,a,a] under
  * (a,a) → ["aa","a"], never ["a","aa"] or ["aaa"].
  *
  * Determinism contract: counts are exact integers, argmax ties break
  * (count desc, left asc, right asc), and the fold is literal-ordered —
  * the oracle replays every round with string_split + list_reduce,
  * hash-exact.
  *
  * Scale shape: each round is one explode + map-side-combined pair count
  * over the DISTINCT-WORD table (vocabulary-sized, not corpus-sized —
  * the standard BPE trick), one 1-row argmax to the driver, and one
  * narrow re-segmentation map; rounds are localCheckpointed so round k
  * never recomputes rounds 1..k−1. Merge count is a small constant
  * (30k–100k in production) — the driver transit is one row per round.
  */
object Bpe {

  private def sy = split(col("w"), " ")

  /** The boundary-exact greedy re-segmentation fold for one merge rule
    * (see object doc) — shared by training and encoding. */
  private def mergeExpr(l: String, r: String) =
    aggregate(
      slice(sy, lit(2), size(sy) - 1), element_at(sy, 1),
      (acc, x) => when(x === lit(r) &&
          (acc === lit(l) || endswith(acc, lit(" " + l))),
        concat(acc, lit(r))).otherwise(concat(acc, lit(" "), x)))

  /** ENCODE: apply an already-learned merge list (in rank order) to
    * (w, freq) words — the tokenizer's apply side; one narrow map per
    * merge, no shuffles at all. */
  def applyMerges(words: DataFrame, merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(words.select(col("w"), col("freq"))) {
      case (df, (l, r)) => df.select(mergeExpr(l, r).as("w"), col("freq"))
    }

  /** Learn `rounds` merges over (w, freq) words. Returns
    * (merge_idx, l, r, pair_count); stops early if no pairs remain. */
  def trainMerges(spark: SparkSession, words: DataFrame,
                  rounds: Int): DataFrame = {
    require(rounds >= 1, s"need at least one round: $rounds")
    import spark.implicits._

    var w = words.select(col("w"), col("freq").cast("long").as("freq"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var i = 1
    var exhausted = false
    while (i <= rounds && !exhausted) {
      val pairs = w
        .select(col("freq"), explode(zip_with(
          slice(sy, lit(1), size(sy) - 1), slice(sy, lit(2), size(sy) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
      val best = pairs.orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).as[(String, String, Long)].collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, cnt) = best(0)
        merges += ((i, l, r, cnt))
        w = w.select(mergeExpr(l, r).as("w"), col("freq")).localCheckpoint()
        i += 1
      }
    }
    spark.createDataset(merges.toSeq)
      .toDF("merge_idx", "l", "r", "pair_count")
  }
}
