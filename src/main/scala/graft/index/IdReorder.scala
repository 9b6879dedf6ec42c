package graft.index

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Doc-id reordering for index compression — the accounting that justifies
  * the classic index-engineering move: posting lists store DELTA GAPS
  * varbyte-encoded, so assigning doc ids in URL order (pages of one host
  * get adjacent ids, and hosts link/share terms locally) shrinks gaps and
  * therefore bytes versus a hash-random assignment. This module measures
  * exactly that: the total varbyte cost of every term's gap sequence under
  * the url-sorted assignment vs a portable-hash-random one.
  *
  * (The production index already USES url-ordered dense ids —
  * [[IndexBuild]] line ~185 — this is the measurement that proves the
  * choice and, at reindex time, prices any proposed re-assignment.)
  *
  * Everything is INTEGER-EXACT: ids are dense ranks, gaps are id
  * differences (first posting costs `id + 1` — the delta from the
  * implicit -1 origin), and varbyte length is a 7-bits-per-byte threshold
  * chain — so any engine replays the byte totals verbatim.
  *
  * Scale shape: both assignments are the two-phase range-sort +
  * partition-offset dense rank (one row per PARTITION transits the
  * driver — [[IndexBuild.partitionOffsets]]), never a single-partition
  * global window; the gap accounting shuffles (term, id) pairs once per
  * scheme and folds map-side.
  */
object IdReorder {

  /** Varbyte encoded length in bytes of a positive gap (7 payload bits per
    * byte, continuation-bit scheme). */
  private[index] def vbLen(g: Column): Column =
    when(g < (1L << 7), 1L).when(g < (1L << 14), 2L)
      .when(g < (1L << 21), 3L).when(g < (1L << 28), 4L)
      .when(g < (1L << 35), 5L).when(g < (1L << 42), 6L)
      .when(g < (1L << 49), 7L).when(g < (1L << 56), 8L)
      .otherwise(9L)

  /** Dense 0-based ids for distinct `url`s in the order of `sortKeys`
    * (which must totally order the urls), via the two-phase
    * partition-offset rank. Returns (url, id). */
  private def denseIds(spark: SparkSession, urls: DataFrame, parts: Int,
                       sortKeys: Seq[Column]): DataFrame = {
    import spark.implicits._
    val keyed = sortKeys.zipWithIndex.map { case (c, i) => c.as(s"_k$i") }
    val kcols = sortKeys.indices.map(i => col(s"_k$i"))
    val sorted = urls.select((col("url") +: keyed): _*)
      .repartitionByRange(parts, kcols: _*)
      .sortWithinPartitions(kcols: _*)
      .persist()
    val (offsets, _) = IndexBuild.partitionOffsets(sorted, parts)
    val offB = spark.sparkContext.broadcast(offsets)
    val ids = sorted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var local = 0L
      it.map { r => val id = offB.value(pid) + local; local += 1; (r.getString(0), id) }
    }.toDF("url", "id").localCheckpoint() // materialize BEFORE unpersisting
    sorted.unpersist()
    ids
  }

  /** Compression accounting over posting triples (`url`, `term`):
    * one row per scheme — (scheme, postings, bytes) with `bytes` the total
    * varbyte cost of all per-term gap sequences under that scheme's id
    * assignment. Schemes: `url_sorted` (ids by url order) and `hashed`
    * (ids by the portable md5 h60 of the url — the random baseline any
    * engine can replay). */
  def report(spark: SparkSession, triples: DataFrame, parts: Int): DataFrame = {
    val postings = triples.select(col("url"), col("term")).distinct().persist()
    val urls = postings.select(col("url")).distinct()
    val byUrl = denseIds(spark, urls, parts, Seq(col("url")))
    val byHash = denseIds(spark, urls, parts,
      Seq(graft.ml.Sketches.h60(col("url")), col("url")))

    def cost(ids: DataFrame, scheme: String): DataFrame = {
      val w = Window.partitionBy(col("term")).orderBy(col("id"))
      postings.join(ids, "url").select(col("term"), col("id"))
        .withColumn("gap",
          coalesce(col("id") - lag(col("id"), 1).over(w), col("id") + 1L))
        .agg(count(lit(1)).as("postings"), sum(vbLen(col("gap"))).as("bytes"))
        .select(lit(scheme).as("scheme"), col("postings"), col("bytes"))
    }
    val out = cost(byUrl, "url_sorted").unionByName(cost(byHash, "hashed"))
      .localCheckpoint() // materialize before releasing the postings cache
    postings.unpersist()
    out
  }
}
