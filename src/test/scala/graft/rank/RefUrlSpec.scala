package graft.rank

import scala.io.Source
import org.scalatest.funsuite.AnyFunSuite
import graft.util.RefHasher

/** Goldens produced by running the COMPILED REFERENCE classes
  * (cis5550.jobs.PageRank.extractURLs/normalizeURLs, cis5550.tools.Hasher,
  * cis5550.tools.URLParser + the PageRank init-normalization flow) on the
  * same inputs, out-of-repo. Format per line:
  * url \t selfNorm \t hash(selfNorm) \t normalizedLink1,normalizedLink2,…
  */
class RefUrlSpec extends AnyFunSuite {

  private def resource(name: String): Vector[String] =
    Source.fromInputStream(getClass.getResourceAsStream(s"/$name"), "UTF-8")
      .getLines().toVector

  private def unesc(s: String): String =
    s.replace("\\t", "\t").replace("\\r", "\r").replace("\\n", "\n")

  private def check(inputFile: String, goldenFile: String): Unit = {
    val inputs = resource(inputFile).map { line =>
      val Array(u, h) = line.split("\t", 2); (unesc(u), unesc(h))
    }
    val goldens = resource(goldenFile).map { line =>
      val parts = line.split("\t", -1)
      (unesc(parts(0)), unesc(parts(1)), parts(2),
        if (parts(3).isEmpty) List.empty[String] else parts(3).split(",").map(unesc).toList)
    }
    for (((urlRaw, html), (goldUrl, goldSelf, goldHash, goldLinks)) <- inputs.zip(goldens)) {
      // the golden's first column is the #-stripped url
      val stripped = { val i = urlRaw.indexOf("#"); if (i >= 0) urlRaw.substring(0, i) else urlRaw }
      assert(stripped == goldUrl)
      val self = RefUrl.selfNormalize(urlRaw)
      assert(self == goldSelf, s"selfNormalize($urlRaw)")
      assert(RefHasher.hash(self) == goldHash, s"hash($self)")
      assert(RefUrl.outlinks(self, html) == goldLinks, s"outlinks($urlRaw)")
    }
  }

  test("URL semantics match reference on the synthetic corpus (69 pages)") {
    check("termcounts_input.tsv", "url_golden_corpus.tsv")
  }

  test("URL semantics match reference on adversarial link forms") {
    check("url_adversarial.tsv", "url_golden_adv.tsv")
  }

  test("hasher quirks") {
    // byte 0 → index 255 ("vs"), negative → 255+b: pinned by the corpus
    // goldens above; spot-check determinism and shape here
    val h = RefHasher.hash("http://example:80/")
    assert(h.length == 40 && h.forall(c => c >= 'a' && c <= 'z'))
    assert(RefHasher.hash("x") == RefHasher.hash("x"))
    assert(RefHasher.hash("x") != RefHasher.hash("y"))
  }
}
