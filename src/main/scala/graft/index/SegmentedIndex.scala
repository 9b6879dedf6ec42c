package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.corpus.Page
import graft.tables.TableIO

/** Checkpoint-resumable segmented index build (the north rule's
  * "resumable from checkpoint with per-partition lineage").
  *
  * The corpus is bucketed by `xxhash64(url) % buckets`; each bucket is
  * tokenized into a SEGMENT (its posting triples + doc metadata) stored as a
  * partition of an Iceberg-layout table whose manifest records the bucket's
  * input fingerprint (order-independent hash over (url, html) of every page
  * in the bucket). A re-run recomputes only buckets whose fingerprint
  * changed — unchanged segments are carried into the new snapshot as hard
  * links, skipping tokenization (the dominant cost) entirely.
  *
  * The global index is then the standard [[IndexBuild]] tail (dense url-rank
  * doc ids → range-partitioned impact-ordered blocks → dictionary) run over
  * the segment postings instead of raw pages — the "segment merge". Doc ids
  * are (re)assigned globally at merge time so docId order ≡ url order holds
  * across segments (required for the reference serving tie-break).
  */
object SegmentedIndex {

  final case class BuildReport(snapshotId: Long, rebuilt: Set[String], reused: Set[String])

  /** Per-bucket order-independent input fingerprint: XOR-fold over the
    * DISTINCT (page hash, multiplicity) pairs — each distinct page hash h
    * (xxhash64 over url + html) with count c contributes
    * xxhash64(h, c), so a page appearing an even number of times can NOT
    * cancel out of the fold the way a plain xor of raw hashes would (two
    * identical pages xor to 0, colliding every even-multiplicity input).
    * XOR stays order-independent and overflow-free under ANSI mode; the
    * extra groupBy is a partial-aggregated count over longs. Row count is
    * appended as a second signal. */
  def fingerprints(pages: DataFrame, buckets: Int): Map[String, String] = {
    val withB = pages.select(
      pmod(xxhash64(col("url")), lit(buckets)).cast("int").as("bucket"),
      xxhash64(col("url"), col("html")).as("h"))
    val rows = withB.groupBy(col("bucket"), col("h"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("bucket"))
      .agg(bit_xor(xxhash64(col("h"), col("c"))).as("fp"),
           sum(col("c")).cast("long").as("n"))
      .collect()
    val m = rows.map(r => r.getInt(0).toString -> s"${r.getLong(1)}_${r.getLong(2)}").toMap
    // buckets with zero pages still need a stable fingerprint
    (0 until buckets).map(b => b.toString -> m.getOrElse(b.toString, "empty_0")).toMap
  }

  /** Tokenize (or reuse) per-bucket segments under `dir`. Segment rows:
    * (bucket, url, term, tf) — url-keyed so global ids can be assigned at
    * merge time; dl rows carried as term="" + tf=dl? No: dl is derivable as
    * sum(tf) per url, which is exactly how the merge computes it. */
  def buildSegments(spark: SparkSession, pages: org.apache.spark.sql.Dataset[Page],
                    lexicon: Set[String], dir: String, buckets: Int): BuildReport = {
    import spark.implicits._
    // same input contract as IndexBuild.build: one body per url (the
    // reference KVS row-key shape). Duplicate urls would tokenize twice into
    // one merged doc id — crash on identical copies, silently double-count
    // on near-identical ones. The check is a tiny url-count agg next to the
    // fingerprint scan.
    val dupUrls = pages.toDF().groupBy(col("url")).count()
      .filter(col("count") > 1).count()
    require(dupUrls == 0,
      s"$dupUrls urls appear on multiple input pages — merge re-crawls with " +
      "StreamIngest.mergeStreamed (last-write-wins) or dedup before building")
    val fps = fingerprints(pages.toDF(), buckets)
    val lex = spark.sparkContext.broadcast(lexicon)
    val (snap, rebuilt, reused) = TableIO.writeResumable(
      spark, dir, "tokenize-segments", "bucket", fps,
      rebuild => {
        val wanted = rebuild.map(_.toInt)
        pages
          .withColumn("bucket", pmod(xxhash64(col("url")), lit(buckets)).cast("int"))
          .filter(col("bucket").isin(wanted.toSeq: _*))
          // project BEFORE the typed map: decoding the full Page row would
          // also materialize `text` (≈ html-sized) per page in the tokenize
          // hot path, and positional tuple binding is fragile to field order
          .select(col("url"), col("html"), col("bucket"))
          .as[(String, Array[Byte], Int)]
          .flatMap { case (url, html, bucket) =>
            graft.text.Text.postings(url, new String(html, "UTF-8"), lex.value)
              .map { case (term, tf) => (bucket, url, term, tf) }
          }.toDF("bucket", "url", "term", "tf")
      })
    BuildReport(snap, rebuilt, reused)
  }

  /** Global merge: segments → BuiltIndex with globally dense url-ordered doc
    * ids (ids are re-assigned every merge; segments stay id-free). */
  def merge(spark: SparkSession, dir: String, parts: Int = 32,
            blockSize: Int = IndexBuild.DefaultBlockSize): BuiltIndex = {
    val seg = TableIO.read(spark, dir).select("url", "term", "tf")
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val b = IndexBuild.fromUrlTermTf(spark, seg, parts, blockSize)
    // the segment cache is this merge's scratch too — release() drops it
    b.copy(scratch = b.scratch :+ seg)
  }
}
