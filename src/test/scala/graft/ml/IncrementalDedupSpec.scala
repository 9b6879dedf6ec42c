package graft.ml

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class IncrementalDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("incremental-dedup-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val t1 = "alpha beta gamma delta epsilon zeta"
  private val t12 = "shared batch duplicate sentence tokens here today"

  test("verdicts: dup_existing beats dup_batch; greedy smaller-id keeps the first") {
    import spark.implicits._
    val existing = Seq(
      (1L, t1),
      (2L, "one two three four five six seven")).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, t1),   // exact copy of frozen doc 1
      (11L, "completely different words entirely novel content here"),
      (12L, t12),  // smallest of an intra-batch dup pair → kept
      (13L, t12),  // matches 12 → dup_batch
      (14L, t1)    // matches frozen 1 AND incoming 10 → dup_existing wins
    ).toDF("doc_id", "text")
    val texts = existing.unionByName(incoming)
    val got = Dedup.incrementalVerdicts(texts,
        Dedup.minhashBands(existing, "doc_id", "text"),
        Dedup.minhashBands(incoming, "doc_id", "text"),
        "doc_id", "text", threshold = 0.8)
      .as[(Long, String)].collect().toMap
    assert(got == Map(
      10L -> "dup_existing", 11L -> "kept", 12L -> "kept",
      13L -> "dup_batch", 14L -> "dup_existing"))
  }

  test("frozen corpus is never re-verdicted and sub-threshold overlap is kept") {
    import spark.implicits._
    val existing = Seq((1L, "aa bb cc dd ee ff gg hh")).toDF("doc_id", "text")
    // shares a couple of tokens but far below jaccard 0.8
    val incoming = Seq((10L, "aa bb zz yy xx ww vv uu")).toDF("doc_id", "text")
    val texts = existing.unionByName(incoming)
    val got = Dedup.incrementalVerdicts(texts,
        Dedup.minhashBands(existing, "doc_id", "text"),
        Dedup.minhashBands(incoming, "doc_id", "text"),
        "doc_id", "text", threshold = 0.8)
      .as[(Long, String)].collect().toMap
    assert(got == Map(10L -> "kept"))
  }

  test("incomingIds frame drives output multiplicity (duplicate batch ids)") {
    import spark.implicits._
    val t1 = "alpha beta gamma delta epsilon zeta eta theta"
    val existing = Seq((1L, t1)).toDF("doc_id", "text")
    // id 10 appears TWICE in the batch (an id collision, like q128's
    // +1000 re-crawl aliases at sf0.1): verdicts must come back one per
    // input ROW, both carrying the id's shared verdict
    val incoming = Seq(
      (10L, t1),
      (10L, "totally different content that matches nothing at all"),
      (11L, "unrelated words entirely novel text here")).toDF("doc_id", "text")
    val texts = existing.unionByName(incoming)
    val got = Dedup.incrementalVerdicts(texts,
        Dedup.minhashBands(existing, "doc_id", "text"),
        Dedup.minhashBands(incoming, "doc_id", "text"),
        "doc_id", "text", threshold = 0.8,
        incomingIds = Some(incoming.select(org.apache.spark.sql.functions.col("doc_id"))))
      .as[(Long, String)].collect().toSeq.sorted
    assert(got == Seq(10L -> "dup_existing", 10L -> "dup_existing", 11L -> "kept"),
      got.toString)
  }
}
