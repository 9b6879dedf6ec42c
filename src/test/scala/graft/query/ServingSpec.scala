package graft.query

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.Corpus
import graft.index.IndexBuild
import graft.util.RefHasher

/** End-to-end reference response bodies over the engine's artifacts:
  * ranked-list JSON from either serving tier, and the keyed point-lookup
  * detail JSON with the reference's HashMap-order serialization and
  * default branches. */
class ServingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("serving-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val numDocs = 120

  lazy val (pagesDir, searcher, lazySearcher) = {
    import spark.implicits._
    val base = Files.createTempDirectory("serving").toString
    val pages = Corpus.generate(spark, numDocs)
    pages.map(p => (RefHasher.hash(p.url), p.url, new String(p.html, "UTF-8")))
      .toDF("key", "url", "html")
      .sortWithinPartitions("key")
      .write.parquet(s"$base/pages")
    val built = IndexBuild.build(spark, pages, Corpus.lexicon, parts = 4, blockSize = 64)
    val idxDir = s"$base/index"
    IndexBuild.save(spark, built, idxDir)
    (s"$base/pages", Searcher.fromIndex(built, numDocs),
      LazySearcher.open(spark, idxDir, numDocs))
  }

  test("GET /query body: ranked JSON array, identical from both tiers") {
    val viaEager = Serving.searchJson(q => searcher.referenceTopK(q), "galaxy engine")
    val viaLazy = Serving.searchJson(q => lazySearcher.referenceTopK(q), "galaxy engine")
    assert(viaEager == viaLazy)
    assert(viaEager.startsWith("[{\"url\":\"") && viaEager.endsWith("\"}]"))
    val expected = DocDetail.toJsonArray(searcher.referenceTopK("galaxy engine"))
    assert(viaEager == expected)
  }

  test("GET /query/:url body: keyed point lookup + HashMap-order info JSON") {
    val url = Corpus.urlOf(7, 16)
    val html = new String(Corpus.makePage(7, numDocs, 16, 42L).html, "UTF-8")
    val got = Serving.detailJson(spark, pagesDir, url)
    assert(got == Serving.pageInfoJson(url, Some(html)))
    // quirk: extracted title rides under "abstract"; "title" stays the url
    val title = DocDetail.getTitle(html)
    assert(got.contains("\"abstract\":\"" + title + "\""))
    assert(got.contains("\"title\":\"" + url + "\""))
    // all three keys present exactly once, object-shaped
    assert(got.count(_ == '{') == 1 && got.count(_ == '}') == 1)
  }

  test("GET /query/:url body for an unknown url: default info map") {
    val got = Serving.detailJson(spark, pagesDir, "http://nowhere.example/missing")
    assert(got == Serving.pageInfoJson("http://nowhere.example/missing", None))
    assert(got.contains("\"abstract\":\"No Information Available\""))
  }

  test("pages table is resolved once across repeated lookups") {
    Serving.detailJson(spark, pagesDir, Corpus.urlOf(1, 16)) // ensure cached
    val before = Serving.pagesLoads.get()
    for (i <- 2L to 20L)
      Serving.detailJson(spark, pagesDir, Corpus.urlOf(i, 16))
    assert(Serving.pagesLoads.get() == before,
      "every lookup after the first must reuse the resolved pages table")
  }
}
