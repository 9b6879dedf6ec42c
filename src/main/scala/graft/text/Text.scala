package graft.text

import java.util.regex.Pattern
import scala.collection.mutable

/** Reference-exact text pipeline (pure functions, shared by the distributed
  * engine and the single-threaded oracle so the semantics cannot drift —
  * SURVEY.md §7.4.2).
  *
  * Every rule below replicates the reference bit-for-bit, including its
  * quirks, because the north rule requires rank-identical top-k and
  * byte-identical extracted text:
  *  - tag strip `<.*?>` → " " (reference jobs/Indexer.java:52) — this IS the
  *    "extracted text" whose bytes must match;
  *  - punctuation class incl. U+2019 (jobs/Indexer.java:53);
  *  - `trim().split(" +")` tokenization — NOTE: an effectively-empty page
  *    yields the single token "" which passes isValidNumber("") and is
  *    counted (Java split semantics, jobs/Indexer.java:54-61);
  *  - token filter: pure ASCII AND (≤3-digit number OR (alphabetic AND in
  *    lexicon)) (jobs/Indexer.java:235-261);
  *  - Porter stem counted in addition to the surface form when different
  *    (jobs/Indexer.java:65-72);
  *  - title/heading boosts with tag iteration order pinned to the
  *    reference's HashMap order [h1,h2,h3,title,h4,h5]
  *    (jobs/Indexer.java:165-207) and the stem-overwrite quirk: the stemmed
  *    variant is WRITTEN (not incremented) with the surface form's
  *    pre-boost count + weight (jobs/Indexer.java:198-199, 226-227);
  *  - URL tokens +30 with http/https/"" skipped (jobs/Indexer.java:209-233).
  */
object Text {

  /** The reference's >100-char term guard (jobs/Indexer.java:98-100) — ONE
    * named constant for every emit site (direct build, segmented build,
    * streaming ingest, oracle, triples dumps); hand-synced copies of the
    * literal previously risked divergence between build paths. */
  val MaxTermLen = 100

  /** [[termCounts]] with the [[MaxTermLen]] guard applied — THE one
    * posting-emit helper; every build path (direct, segmented, streaming,
    * probes, triples dumps) maps this into its own row shape instead of
    * hand-copying the tokenize+filter block. */
  def postings(url: String, page: String, lexicon: Set[String]): Iterator[(String, Int)] =
    termCounts(url, page, lexicon).iterator.filter(_._1.length <= MaxTermLen)


  // PRECOMPILED patterns: String.replaceAll/split call Pattern.compile on
  // every invocation, and these run several times per page inside the
  // build's hottest loop (tokenize). Pattern.matcher(..).replaceAll and
  // Pattern.split(s) are what String delegates to — output byte-identical
  // (golden-pinned).
  private val TagP = Pattern.compile("<.*?>")
  /** Reference punctuation class (jobs/Indexer.java:53; note U+2019 ’). */
  private val PunctP = Pattern.compile("[\t\r\n.,:;!?’'\"()-]")
  private val SpacesP = Pattern.compile(" +")
  private val QuerySplitP = Pattern.compile("[^a-zA-Z0-9]")

  /** Reference extractor: non-greedy tag strip, no entity decoding.
    * Byte-identity invariant vs reference jobs/Indexer.java:52. */
  def extractText(html: String): String = TagP.matcher(html).replaceAll(" ")

  def stripPunct(s: String): String = PunctP.matcher(s).replaceAll(" ")

  /** Java `trim().split(" +")`: "" input → Array(""). */
  def splitWords(s: String): Array[String] = SpacesP.split(s.trim)

  def isPureAscii(v: String): Boolean = {
    var i = 0
    while (i < v.length) { if (v.charAt(i) >= 128) return false; i += 1 }
    true
  }

  /** Alphabetic-only (jobs/Indexer.java:239-247). Empty string → true. */
  def isValidWord(w: String): Boolean = {
    var i = 0
    while (i < w.length) {
      val c = w.charAt(i)
      if (!((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))) return false
      i += 1
    }
    true
  }

  /** ≤3-digit pure number (jobs/Indexer.java:249-261). Empty string → true
    * (the loop never rejects), replicated deliberately. */
  def isValidNumber(w: String): Boolean = {
    if (w.length > 3) return false
    var i = 0
    while (i < w.length) {
      val c = w.charAt(i)
      if (!(c >= '0' && c <= '9')) return false
      i += 1
    }
    true
  }

  /** Tag iteration order = the reference JVM's HashMap(title→50,h1→30,…)
    * keySet() order, observed as [h1, h2, h3, title, h4, h5]. Pinned here
    * because the stem-overwrite quirk makes boost order affect counts. */
  private val BoostTags: Seq[(String, Int)] =
    Seq("h1" -> 30, "h2" -> 20, "h3" -> 10, "title" -> 50, "h4" -> 5, "h5" -> 3)

  private val boostPatterns: Seq[(Pattern, Int)] =
    BoostTags.map { case (tag, w) => Pattern.compile("<" + tag + ">(.*?)</" + tag + ">") -> w }

  /** Stems are requested once per token OCCURRENCE in the build's hottest
    * loop, but every stemmed token has already passed the ASCII +
    * number-or-lexicon filter — a BOUNDED universe (lexicon ∪ ≤3-digit
    * numbers ∪ ""), so the full Porter machine runs once per distinct
    * token per JVM and every repeat is a hash lookup. Pure function ⇒
    * byte-identical output (golden-pinned). */
  private val stemCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def stemOf(w: String): String =
    stemCache.computeIfAbsent(w, PorterStemmer.stem(_))

  /** Term → boosted count for one page, replicating the reference order:
    * urlHit, then titleHit, then body tokens (jobs/Indexer.java:48-72). */
  def termCounts(url: String, page: String, lexicon: Set[String]): mutable.HashMap[String, Int] = {
    val counts = mutable.HashMap.empty[String, Int]
    boostHit(splitWords(stripPunct(url)), 30, counts, lexicon)       // urlHit
    for ((p, weight) <- boostPatterns) {                             // titleHit
      val m = p.matcher(page)
      while (m.find()) {
        val inner = stripPunct(extractText(m.group(1)))
        boostHit(splitWords(inner), weight, counts, lexicon)
      }
    }
    val words = splitWords(stripPunct(extractText(page)))            // body
    var i = 0
    while (i < words.length) {
      val w = words(i).toLowerCase
      if (isPureAscii(w) && (isValidNumber(w) || (isValidWord(w) && lexicon.contains(w)))) {
        counts.update(w, counts.getOrElse(w, 0) + 1)
        val stem = stemOf(w)
        if (stem != w) counts.update(stem, counts.getOrElse(stem, 0) + 1)
      }
      i += 1
    }
    counts
  }

  /** Shared boost pass (urlHit/titleHit): surface += weight; stemmed variant
    * OVERWRITTEN with surface's pre-boost count + weight (reference bug,
    * jobs/Indexer.java:198-199, 226-227 — replicated for rank-identity). */
  private def boostHit(words: Array[String], weight: Int,
                       counts: mutable.HashMap[String, Int], lexicon: Set[String]): Unit = {
    var i = 0
    while (i < words.length) {
      val w = words(i).toLowerCase
      if (w != "http" && w != "https" && w != "" &&
          isPureAscii(w) && isValidWord(w) && lexicon.contains(w)) {
        val occ = counts.getOrElse(w, 0)
        counts.update(w, occ + weight)
        val stem = stemOf(w)
        if (stem != w) counts.update(stem, occ + weight)
      }
      i += 1
    }
  }

  /** Query parse: trim, lowercase, split on non-alphanumeric, drop empties
    * (backend/Backend.java:169-186). */
  def parseQuery(query: String): Seq[String] =
    QuerySplitP.split(query.trim.toLowerCase).toIndexedSeq.filter(_.nonEmpty)
}
