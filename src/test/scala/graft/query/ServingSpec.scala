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

  test("HTTP surface round-trips byte-identical bodies over the direct tier") {
    import spark.implicits._
    // direct-tier artifacts: index + pages + ranks sidecars
    val pages = Corpus.generate(spark, numDocs)
    val built = IndexBuild.build(spark, pages, Corpus.lexicon, parts = 4, blockSize = 64)
    val dir = Files.createTempDirectory("serving-http").toString
    DirectIndex.write(built, dir)
    DirectIndex.writePages(
      pages.map(p => (RefHasher.hash(p.url), p.url, new String(p.html, "UTF-8")))
        .toDF("key", "url", "html"), dir)
    val (ranksDs, _) = graft.rank.PageRank.compute(spark, pages)
    DirectIndex.writeRanks(ranksDs, dir)

    val ds = DirectSearcher.open(dir, numDocs)
    val dp = DirectPages.open(dir)
    val dr = DirectRanks.open(dir)
    val srv = HttpServing.start(ds, dp, Some(dr))
    try {
      def get(pathAndQuery: String): (Int, String, String) = {
        val conn = new java.net.URL(s"http://127.0.0.1:${srv.port}$pathAndQuery")
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        val code = conn.getResponseCode
        val is = if (code < 400) conn.getInputStream else conn.getErrorStream
        val body = if (is == null) "" else
          try new String(is.readAllBytes(), "UTF-8") finally is.close()
        (code, body, conn.getHeaderField("Content-Type"))
      }
      // hello route, verbatim (Backend.java:36-38)
      assert(get("/") == ((200, "<html><h2>HELLO</h2></html>", "text/html")))
      // /query: byte-identical to Serving.searchJson over the SAME tier,
      // incl. the pagerank blend and a '+'-encoded multi-term query
      for (q <- Seq("galaxy", "galaxy engine search", "the", "zzzabsent")) {
        val enc = java.net.URLEncoder.encode(q, "UTF-8")
        val (code, body, ct) = get(s"/query?query=$enc")
        assert(code == 200 && ct == "application/json")
        assert(body == Serving.searchJson(
          x => ds.referenceTopK(x, Some(dr.prFunction)), q), s"query '$q'")
      }
      // /query/:url: byte-identical detail JSON, hit + miss
      val url = Corpus.urlOf(7, 16)
      val encUrl = java.net.URLEncoder.encode(url, "UTF-8")
      assert(get(s"/query/$encUrl")._2 == dp.detailJson(url))
      val miss = java.net.URLEncoder.encode("http://nowhere.example/x", "UTF-8")
      assert(get(s"/query/$miss")._2 ==
        Serving.pageInfoJson("http://nowhere.example/x", None))
      // missing query param serves the empty query's list; junk path 404s
      assert(get("/query")._1 == 200)
      assert(get("/nope")._1 == 404)
      // malformed %-escapes are client errors: 400, not the generic 500,
      // in both decode positions
      assert(get("/query?query=%zz")._1 == 400)
      assert(get("/query/http%zz")._1 == 400)
    } finally srv.stop()
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
