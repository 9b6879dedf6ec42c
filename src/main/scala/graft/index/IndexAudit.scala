package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed index-integrity audit — fsck for the inverted index. A
  * production index is an ARTIFACT served for months after the build job
  * is gone; before a segment merge is promoted or a snapshot is expired,
  * the operator wants a distributed pass proving the artifact is
  * internally consistent, not a spot check. Verified invariants:
  *
  *  - every posting block DECODES: varbyte doc-deltas and tf/permutation
  *    streams yield exactly `n` postings (a truncated byte array fails
  *    here, not at query time);
  *  - per block, doc ids are STRICTLY ascending in stored order (the
  *    delta-coding precondition — an equal or descending id means a
  *    corrupt merge) and the block-max metadata equals the decoded
  *    max tf (a lying block-max silently breaks WAND pruning);
  *  - per term, the DICTIONARY row equals the blocks: df = Σ block n,
  *    max_tf = max block max (a drifted dictionary mis-scores IDF).
  *
  * Scale shape: one pass over the blocks table (decode is per-block local
  * work), one map-side-combined agg on term, one broadcast-sized join
  * with the dictionary; only the k report rows transit the driver.
  */
object IndexAudit {

  /** Audit `built`, returning the top-k terms by (df desc, term asc) with
    * their stored stats and a per-term `all_ok` verdict. A healthy index
    * reports all_ok = true on every row; the driver oracle recomputes
    * df/max_tf independently from the tokenizer-truth triples, so a drift
    * in EITHER the dictionary or the blocks mismatches. */
  def audit(built: BuiltIndex, k: Int = 100): DataFrame = {
    val spark = built.blocks.sparkSession
    import spark.implicits._
    val fromBlocks = built.blocks.map { b =>
      val (docs, tfs) = IndexBuild.decodeBlockDocOrder(b)
      var mono = true
      var i = 1
      while (i < docs.length) { if (docs(i) <= docs(i - 1)) mono = false; i += 1 }
      val maxDec = if (tfs.isEmpty) 0 else tfs.max
      val blockOk = mono && docs.length == b.n && tfs.length == b.n &&
        maxDec == b.max_tf
      (b.term, docs.length.toLong, maxDec, blockOk)
    }.toDF("term", "n_dec", "max_dec", "block_ok")
      .groupBy("term")
      .agg(sum(col("n_dec")).as("df_blocks"),
        max(col("max_dec")).as("max_tf_blocks"),
        min(col("block_ok").cast("int")).as("blocks_ok"))
    built.dictionary.toDF()
      .join(fromBlocks, Seq("term"), "full_outer")
      .select(col("term"), col("df"), col("max_tf"),
        // a term on only ONE side (dict-only / blocks-only) is a failure,
        // not a null verdict
        coalesce(col("blocks_ok") === 1 &&
          col("df") === col("df_blocks") &&
          col("max_tf") === col("max_tf_blocks"), lit(false)).as("all_ok"))
      .orderBy(col("df").desc, col("term").asc)
      .limit(k)
  }
}
