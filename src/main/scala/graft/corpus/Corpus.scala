package graft.corpus

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.text.Text

/** One Common-Crawl-style web page row — the engine's primary input shape
  * (BASELINE.json `input_hint`): url, fetch timestamp, raw html bytes, the
  * reference-extracted text, and a language tag.
  */
final case class Page(url: String, warc_ts: Timestamp, html: Array[Byte],
                      text: String, lang: String)

/** Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1).
  *
  * Same (seed, numDocs, numHosts) → byte-identical table at ANY parallelism
  * level: every page is a pure function of its index `i`, generated from a
  * per-page RNG seeded by (seed, i) — no dependence on partitioning, task
  * order, or row order. That property is what makes the scaling benchmark
  * (local[N] vs local[4N]) read the *same* input and what makes oracle tests
  * reproducible.
  *
  * Content rules exercise every reference tokenizer branch
  * (reference jobs/Indexer.java:52-74, 165-261):
  *  - Zipf(~1.07) body draws over a lexicon vocabulary → genuine head-term
  *    skew for the salted-aggregation path;
  *  - punctuation from the reference strip class incl. U+2019, non-ASCII
  *    tokens, >3-digit and ≤3-digit numbers, >100-char terms, non-lexicon
  *    words (all dropped or kept per the reference rules);
  *  - <title>/<h1>/<h2>/<h3> boosts and <a href> links (relative, absolute,
  *    #fragment, and a dangling target) for PageRank
  *    (reference jobs/PageRank.java:182-284).
  */
object Corpus {

  /** Body vocabulary (lexicon subset). Index 0 is the head term. Includes
    * words whose Porter stem differs (galaxy→galaxi, running→run, …) so stem
    * expansion and the 0.7 stem factor get signal. */
  val vocab: Vector[String] = Vector(
    "the", "of", "and", "to", "a", "in", "is", "you", "that", "it",
    "he", "was", "for", "on", "are", "as", "with", "his", "they", "i",
    "at", "be", "this", "have", "from", "or", "one", "had", "by", "word",
    "galaxy", "running", "abilities", "station", "planet", "officer",
    "soldier", "prince", "general", "history", "science", "machine",
    "engine", "search", "index", "query", "ranking", "crawler", "parser",
    "network", "system", "distributed", "storage", "table", "worker",
    "partition", "shuffle", "cluster", "stream", "batch", "memory",
    "disk", "cache", "thread", "socket", "packet", "router", "server",
    "client", "protocol", "message", "compression", "encoding", "decoder",
    "universe", "nebula", "comet", "asteroid", "orbit", "gravity",
    "telescope", "observation", "discovery", "expedition", "voyage",
    "captain", "harbor", "vessel", "ocean", "island", "mountain",
    "valley", "river", "forest", "desert", "climate", "weather",
    "season", "winter", "summer", "autumn", "spring", "morning",
    "evening", "night", "shadow", "light", "color", "sound", "music",
    "silence", "language", "letter", "number", "figure", "picture",
    "painting", "artist", "writer", "reader", "library", "archive",
    "document", "record", "report", "journal", "article", "chapter",
    "story", "legend", "mystery", "question", "answer", "problem",
    "solution", "method", "theory", "practice", "experiment", "result",
    "measure", "balance", "motion", "energy", "force", "pressure",
    "temperature", "electric", "magnetic", "chemical", "biological",
    "computation", "algorithm", "function", "variable", "constant",
    "matrix", "vector", "tensor", "graph", "tree", "node", "edge",
    "path", "cycle", "flow", "capacity", "demand", "supply", "market",
    "trade", "value", "price", "money", "capital", "industry", "factory",
    "product", "service", "quality", "quantity", "growth", "decline",
    "nation", "country", "city", "village", "street", "building",
    "bridge", "tunnel", "railway", "airport", "vehicle", "journey",
    "travel", "visitor", "stranger", "friend", "family", "mother",
    "father", "brother", "sister", "child", "people", "person",
    "society", "culture", "tradition", "ceremony", "festival", "holiday",
    "government", "council", "minister", "president", "election",
    "decision", "justice", "freedom", "courage", "wisdom", "knowledge",
    "education", "student", "teacher", "school", "college", "university",
    "lecture", "lesson", "example", "exercise", "training", "skill")

  /** Words that appear in page bodies but are NOT in the lexicon — the
    * reference drops them (jobs/Indexer.java:59). */
  val nonLexicon: Vector[String] = Vector(
    "zyxwavuq", "qqplumbo", "vextrillion", "kraqen", "blorptex")

  /** The lexicon handed to the indexer (reference Project/lexicon.txt is a
    * 9,999-word list loaded per worker, flame/Worker.java:576-597). Ours is
    * the corpus vocabulary plus a few extra real words so query terms absent
    * from every document still resolve through the lexicon path. */
  val lexicon: Set[String] =
    vocab.toSet ++ Set("kutuzov", "dolokhov", "regiment", "apparently",
      "recollect", "suite", "french", "ranks", "greatcoat", "changed",
      "already", "among", "reduced", "remind", "stepped", "forward",
      "trying", "told", "wait", "called", "gray", "said", "asked", "who",
      "not", "me", "being", "other", "were", "which", "their", "them")

  private val zipfExp = 1.07

  /** Precomputed Zipf CDF over the vocabulary. */
  private lazy val zipfCdf: Array[Double] = {
    val w = Array.tabulate(vocab.length)(i => 1.0 / math.pow(i + 1, zipfExp))
    val total = w.sum
    val cdf = new Array[Double](w.length)
    var acc = 0.0
    var i = 0
    while (i < w.length) { acc += w(i) / total; cdf(i) = acc; i += 1 }
    cdf
  }

  private def zipfDraw(rng: java.util.Random): String = {
    val u = rng.nextDouble()
    var lo = 0; var hi = zipfCdf.length - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (zipfCdf(mid) < u) lo = mid + 1 else hi = mid
    }
    vocab(lo)
  }

  val epochBase: Long = 1700000000000L // fixed UTC base for warc_ts

  def urlOf(i: Long, numHosts: Int): String = {
    val h = (i % numHosts).toInt
    val port = if (h % 2 == 0) "" else ":443"
    s"http://host$h.example$port/p/$i"
  }

  /** Pure page builder: index → Page. Everything derives from rng(seed,i). */
  def makePage(i: Long, numDocs: Long, numHosts: Int, seed: Long): Page = {
    val rng = new java.util.Random(seed * 0x9E3779B97F4A7C15L + i * 0xC2B2AE3D27D4EB4FL)
    val url = urlOf(i, numHosts)

    val titleWords = Seq.fill(2 + rng.nextInt(2))(zipfDraw(rng))
    val h1Words = Seq.fill(1 + rng.nextInt(2))(zipfDraw(rng))
    val h2Words = Seq.fill(1 + rng.nextInt(3))(zipfDraw(rng))
    val h3Words = if (rng.nextInt(4) == 0) Seq.fill(2)(zipfDraw(rng)) else Nil

    val bodyLen = 40 + rng.nextInt(120)
    val body = new StringBuilder
    var k = 0
    while (k < bodyLen) {
      val r = rng.nextInt(100)
      val tok =
        if (r < 88) zipfDraw(rng)
        else if (r < 91) nonLexicon(rng.nextInt(nonLexicon.length))
        else if (r < 93) String.valueOf(rng.nextInt(1000))          // kept ≤3-digit number
        else if (r < 95) String.valueOf(10000 + rng.nextInt(90000)) // dropped >3-digit
        else if (r < 96) "café"                                // non-ASCII, dropped
        else if (r < 97) "x" * 101                                  // non-lexicon AND >100 chars: dropped
        // by the lexicon filter BEFORE the MaxTermLen guard ever sees it (the
        // guard itself is unit-tested in TextSpec with a synthetic lexicon)
        else zipfDraw(rng) + (if (rng.nextBoolean()) "," else if (rng.nextInt(2) == 0) "’" else "!")
      body.append(tok)
      // reference-class punctuation / whitespace separators
      val sep = rng.nextInt(10) match {
        case 0 => ". "
        case 1 => ",\r\n"
        case 2 => "; "
        case _ => " "
      }
      body.append(sep)
      k += 1
    }

    // Links: structured k-hop graph + hub cluster + dangling + fragment forms
    // (FIXTURES.md §1). Capped well under the reference's 50/page.
    val links = new StringBuilder
    val hops = Seq(1L, 7L, 31L)
    for (h <- hops) {
      val j = (i * h + 3) % numDocs
      links.append(s"""<a href="${urlOf(j, numHosts)}">link$j</a> """)
    }
    if (i % 5 == 0) links.append(s"""<a href="/p/${(i + 1) % numDocs}">rel</a> """)
    if (i % 7 == 0) links.append(s"""<a href="${urlOf((i + 2) % numDocs, numHosts)}#frag">frag</a> """)
    if (i % 11 == 0) links.append(s"""<a href="http://dangling.example/missing/$i">gone</a> """)

    val html =
      s"""<html><head><title>${titleWords.mkString(" ")}</title></head><body>
         |<h1>${h1Words.mkString(" ")}</h1>
         |<h2>${h2Words.mkString(" ")}</h2>
         |${if (h3Words.nonEmpty) s"<h3>${h3Words.mkString(" ")}</h3>" else ""}
         |<p>${body.toString.trim}</p>
         |$links
         |</body></html>""".stripMargin

    val lang = if (rng.nextInt(50) == 0) "xx" else "en"
    Page(url, new Timestamp(epochBase + i * 1000L),
         html.getBytes("UTF-8"), Text.extractText(html), lang)
  }

  /** Distributed generation: spark.range → pure map. No shuffle; output is
    * partition-count-independent because rows are pure functions of i. */
  def generate(spark: SparkSession, numDocs: Long, numHosts: Int = 16,
               seed: Long = 42L, slices: Option[Int] = None): Dataset[Page] = {
    import spark.implicits._
    // content is keyed on i alone → identical at any partition count;
    // `slices` sets the tokenize-stage task count (benchmarks run ≥2 waves
    // of tasks per core so one straggler can't extend the whole stage)
    val ids = slices.map(s => spark.range(0L, numDocs, 1L, s))
      .getOrElse(spark.range(numDocs))
    ids.map(i => makePage(i, numDocs, numHosts, seed))
  }

  /** Local (driver-side) generation for the oracle and unit tests. */
  def generateLocal(numDocs: Long, numHosts: Int = 16, seed: Long = 42L): Seq[Page] =
    (0L until numDocs).map(i => makePage(i, numDocs, numHosts, seed))

  /** Adversarial pages for the scorer's url hygiene filter
    * (reference backend/Backend.java:268-273, 317-324): urls that URL-decode
    * to something that must be kept (%20, '+'), skipped (embedded or
    * %-escaped quote, control char, the literal "null"), or that make
    * URLDecoder THROW (malformed escape) — which the reference's catch turns
    * into an empty posting list for the whole term. Used by IndexSpec
    * alongside the clean corpus; NOT part of [[generate]] so driver-facing
    * query results stay stable. */
  def adversarialPages: Seq[Page] = {
    def page(url: String, i: Int, body: String): Page = {
      val html = s"<html><head><title>telescope</title></head><body><p>$body</p></body></html>"
      Page(url, new Timestamp(epochBase + 10_000_000L + i * 1000L),
        html.getBytes("UTF-8"), Text.extractText(html), "en")
    }
    Seq(
      // kept: decodes to a url with a space
      page("http://adv.example/a%20b/doc1", 0, "telescope observation observation"),
      // kept: '+' decodes to a space (URLDecoder form-decoding quirk)
      page("http://adv.example/plus+path", 1, "telescope discovery"),
      // skipped: decoded url contains a double quote (literal)
      page("http://adv.example/q\"uote", 2, "telescope orbit orbit orbit"),
      // skipped: %22 decodes TO a double quote
      page("http://adv.example/esc%22quote", 3, "telescope gravity"),
      // skipped: the literal string "null"
      page("null", 4, "telescope comet comet"),
      // skipped: control char in the url
      page("http://adv.example/ctl\u0001x", 5, "telescope nebula"),
      // THROWS in URLDecoder (malformed escape): the reference's catch
      // empties the ENTIRE posting list of every term this doc contains
      page("http://adv.example/bad%zzescape", 6, "telescope asteroid expedition"))
  }
}
