package graft.query

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.{BuiltIndex, DictEntry, IndexBuild, PostingBlock}
import graft.text.{PorterStemmer, Text}

/** Point-lookup serving tier over artifacts persisted by [[IndexBuild.save]]
  * — the 100 TB-shaped twin of [[Searcher.fromIndex]]: NOTHING data-sized is
  * collected to the serving node up front.
  *
  * What lives in memory at open():
  *  - the dictionary — lexicon-bounded, small at ANY corpus scale;
  *  - three corpus scalars (numDocs, avgdl via exact integer dl-sum, dlMin)
  *    from one aggregation job.
  *
  * Per query:
  *  1. ONE term-pruned parquet read fetches only the query terms' posting
  *     blocks — the blocks table is written term-sorted
  *     ([[IndexBuild.save]]), so parquet min/max statistics skip every other
  *     file/row group. This mirrors the reference Backend's per-term
  *     `kvs.getRow("pt-TF", term)` point fetch
  *     (reference backend/Backend.java:221) — the reference also pulls the
  *     full posting row per term; ours arrives delta+varbyte compressed.
  *  2. ONE point fetch of (url, dl) for exactly the doc ids those blocks
  *     contain — the (small) id list is broadcast against the docs table,
  *     never the reverse.
  *  3. Scoring runs driver-side through the SAME [[Searcher]] code over the
  *     fetched slice — results are identical to the eager searcher by
  *     construction (LazySearcherSpec asserts exact equality and that bytes
  *     read per query ≪ index size).
  *
  * Latency note: each query costs 2 Spark jobs (~10²ms scheduling floor in
  * local mode), so this tier serves batch/cold lookups; a hot serving node
  * keeps [[Searcher.fromIndex]]'s in-heap layout for single-digit-ms p95.
  * In production the two tiers meet in the middle: per-shard serving
  * processes mmap their shard's blocks and use exactly this fetch pattern.
  */
final class LazySearcher(spark: SparkSession, dir: String, val n: Int,
                         isinThreshold: Int = 2048) {
  import spark.implicits._

  private val built: BuiltIndex = IndexBuild.load(spark, dir)

  private val dict: Map[String, DictEntry] =
    built.dictionary.collect().map(d => d.term -> d).toMap

  // corpus stats: exact integer dl sum → double once (same arithmetic as
  // Searcher.fromIndex, so BM25 scores are bit-identical)
  private val (numDocs, avgdl, dlMin) = {
    val r = built.docs.agg(count(lit(1)), sum($"dl"), min($"dl")).head()
    val nd = r.getLong(0)
    val sumDl = if (r.isNullAt(1)) 0L else r.getLong(1)
    val minDl = if (r.isNullAt(2)) 0L else r.getLong(2)
    (nd, if (nd == 0) 1.0 else sumDl.toDouble / nd, minDl)
  }

  /** Terms either scorer can touch for this query — the shared
    * [[Searcher.expansionTerms]] superset, pruned to the dictionary. */
  private def expansionTerms(query: String): Seq[String] =
    Searcher.expansionTerms(query).filter(dict.contains)

  private def fetchBlocks(terms: Seq[String]): Map[String, IndexedSeq[PostingBlock]] =
    if (terms.isEmpty) Map.empty
    else Searcher.groupBlocks(
      built.blocks.filter($"term".isin(terms: _*)).collect().toIndexedSeq)

  /** Point fetch of touched docs. Small id sets go down as an In-filter —
    * pushed into the parquet scan, where the doc_id-sorted docs table
    * ([[IndexBuild.save]]) prunes row groups; large sets (head-term BM25)
    * switch to broadcasting the id list against the docs table. */
  private def fetchDocs(ids: Array[Long]): Map[Long, (String, Long)] =
    if (ids.isEmpty) Map.empty
    else if (ids.length <= isinThreshold) {
      built.docs.filter($"doc_id".isin(ids.toIndexedSeq: _*))
        .collect()
        .map(d => d.doc_id -> ((d.url, d.dl))).toMap
    } else {
      val idsDf = ids.toIndexedSeq.toDF("doc_id")
      built.docs.join(broadcast(idsDf), Seq("doc_id"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    }

  /** Materialize the query's slice of the index as a regular [[Searcher]].
    * Known cost: the id-collection decode here and the scorer's own decode
    * each walk the fetched blocks once (2× decode per query). Accepted:
    * this tier's latency is dominated by its two Spark jobs (~10² ms
    * scheduling floor, class doc), so the second in-memory decode is noise
    * here — the interactive tier (DirectSearcher) is the one where decode
    * cost shows, and it decodes lazily exactly once per touched block. */
  private def slice(query: String): Searcher = {
    val terms = expansionTerms(query)
    val blocks = fetchBlocks(terms)
    val ids = blocks.valuesIterator.flatten
      .flatMap(b => IndexBuild.decodeBlockDocOrder(b)._1.iterator)
      .toArray.distinct
    val docs = fetchDocs(ids)
    new Searcher(n, dict, t => blocks.getOrElse(t, IndexedSeq.empty), id => docs(id)._1, id => docs(id)._2,
      avgdl, dlMin, numDocs)
  }

  def referenceTopK(query: String,
                    pagerank: Option[String => Double] = None): List[(String, Double)] =
    slice(query).referenceTopK(query, pagerank)

  def bm25TopK(query: String, k: Int = 10, k1: Double = 1.2,
               b: Double = 0.75): List[(String, Double)] =
    slice(query).bm25TopK(query, k, k1, b)
}

object LazySearcher {
  def open(spark: SparkSession, dir: String, n: Int): LazySearcher =
    new LazySearcher(spark, dir, n)
}
