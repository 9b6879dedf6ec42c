package graft.query

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.Corpus
import graft.index.IndexBuild

/** The Bloom hygiene pre-screen must be bit-identical to the exact-set walk
  * even when the filter fires FALSE POSITIVES on clean docs — the
  * suspect-mark → exact-verify → ordered-replay pipeline's whole point.
  * (IndexSpec covers the end-to-end `forceBloomHygiene` batch; this spec
  * saturates the filter with clean ids so verified-clean suspects are
  * guaranteed, not left to fpp chance.) */
class QueryOpsBloomSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("queryops-bloom-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("bloom walk with forced false positives equals the exact walk") {
    import spark.implicits._
    val pages = Corpus.generateLocal(80) ++ Corpus.adversarialPages
    val built = IndexBuild.build(spark, spark.createDataset(pages),
      Corpus.lexicon, parts = 3, blockSize = 64)
    val docs = built.docs.collect()
    val skip = docs.filter(d => QueryOps.classifyUrl(d.url) == 1).map(_.doc_id).toSet
    val thr = docs.filter(d => QueryOps.classifyUrl(d.url) == 2).map(_.doc_id).toSet
    assert(skip.nonEmpty && thr.nonEmpty, "adversarial fixture must flag docs")
    val clean = docs.map(_.doc_id).filterNot(id => skip(id) || thr(id))

    // every flagged id + every third CLEAN id goes into the filter: the
    // clean ones are deterministic false positives that the exact verify
    // must resolve back to counting postings
    val bf = org.apache.spark.util.sketch.BloomFilter.create(docs.length.toLong, 0.0001)
    (skip ++ thr).foreach(bf.putLong)
    val fps = clean.zipWithIndex.collect { case (id, i) if i % 3 == 0 => id }
    fps.foreach(bf.putLong)
    assert(fps.forall(bf.mightContainLong), "forced FPs must hit the filter")
    val screen = QueryOps.BloomScreen(bf, (skip.size + thr.size).toLong)

    // term stats exactly as batchReferenceTopK derives them (N = the
    // reference's production constant, keeping head terms' idf nonzero)
    val n = 300000
    val dict = built.dictionary.collect().map(d => d.term -> d).toMap
    val qs = Seq("telescope", "observation comet", "nebula gravity", "asteroid",
      "expedition", "galaxy engine search", "the")
    val stats = qs.flatMap(QueryOps.termWeights(_).map(_._1)).distinct
      .flatMap(t => dict.get(t).map(d =>
        t -> (math.log((n / d.df).toDouble) / math.log(500.0), d.max_tf)))
      .filter(_._2._1 != 0.0).toMap
    val liveTerms = stats.keys.toSeq.sorted
    assert(liveTerms.nonEmpty)

    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val exact = rows(QueryOps.walkTermPostings(spark, built, liveTerms, stats, skip, thr))
    val (bloomDf, scratch) = QueryOps.bloomWalkTermPostings(spark, built, liveTerms, stats, screen)
    val bloom = rows(bloomDf)
    scratch.unpersist() // the caller's contract: drop the stage-1 cache once consumed
    assert(exact.nonEmpty)
    assert(bloom == exact,
      s"bloom-walk drift: missing=${(exact -- bloom).take(3)} extra=${(bloom -- exact).take(3)}")
  }
}
