package graft.oracle

import scala.collection.mutable
import graft.text.{PorterStemmer, Text}

/** Single-threaded, literal reimplementation of the reference engine's
  * index + scoring semantics (SURVEY.md §5.2) — the correctness oracle the
  * distributed Spark engine must match rank-identically.
  *
  * Sources of truth replicated here:
  *  - term counting: reference jobs/Indexer.java:40-74 (via the shared
  *    [[graft.text.Text.termCounts]], itself verified against the compiled
  *    reference classes);
  *  - tf normalization `0.4 + 0.6*tf/maxFreq` with postings sorted tf-desc
  *    and the >100-char term guard: jobs/Indexer.java:88-127;
  *  - scorer: backend/Backend.java:40-139, 169-186, 205-330, 333-410 —
  *    augmented-TF × log base-500 IDF with Java INT division N/df, idf==0
  *    drop, 0.7 stem discount, per-term 200-posting cap, score-sum per url,
  *    stable desc sort with url-asc ties (TreeMap iteration), final top-200.
  *
  * Where the reference is nondeterministic (HashMap/arrival order), the
  * canonical order is pinned: postings tie-break (tf desc, url asc)
  * [SURVEY §7.4.1]; query-term score summation in query order, surface terms
  * first then appended stems, later duplicates overwriting earlier entries
  * exactly as `TFIDFMap.put` does (Backend.java:92).
  */
object Oracle {

  final case class Posting(url: String, tf: Int, tfn: Double)

  /** term → postings in canonical serving order (tf desc, url asc). */
  def buildIndex(pages: Seq[(String, String)],
                 lexicon: Set[String]): Map[String, IndexedSeq[Posting]] = {
    val inv = mutable.HashMap.empty[String, mutable.ArrayBuffer[(String, Int)]]
    for ((url, html) <- pages) {
      val counts = Text.termCounts(url, html, lexicon)
      for ((term, tf) <- counts) {
        if (term.length <= graft.text.Text.MaxTermLen) // jobs/Indexer.java:98-100
          inv.getOrElseUpdate(term, mutable.ArrayBuffer.empty) += ((url, tf))
      }
    }
    inv.iterator.map { case (term, posts) =>
      val sorted = posts.sortBy { case (url, tf) => (-tf, url) }
      val maxFreq = sorted.head._2
      term -> sorted.map { case (url, tf) =>
        // double math exactly as jobs/Indexer.java:118 (coefA = 0.4)
        Posting(url, tf, 0.4 + 0.6 * tf / maxFreq)
      }.toIndexedSeq
    }.toMap
  }

  /** log base 500 via ratio of natural logs (Backend.java:326-328). */
  private def customLog(base: Double, x: Double): Double =
    math.log(x) / math.log(base)

  /** Full reference query pipeline. Returns ranked (url, score), ≤200 rows.
    *
    * `pagerank`: None = the live Backend behavior `score = 1.0*TFIDF`
    * (Backend.java:363, PageRank lookup commented out). Some(ranks) = the
    * designed blend from the backup scorer: per-posting
    * `0.7*TFIDF + 0.3*pagerank(url)`, summed across query terms
    * (Project/backup/Backend1210.java:250-270). */
  def score(query: String, n: Int,
            index: Map[String, IndexedSeq[Posting]],
            pagerank: Option[String => Double] = None): List[(String, Double)] = {
    // parse: trim, lowercase, split on non-alphanumeric, drop empties
    val surface = Text.parseQuery(query)
    // stem expansion appended AFTER all surface terms (Backend.java:56-63)
    val expanded: Seq[(String, Boolean)] =
      surface.map(t => (t, false)) ++
        surface.flatMap { t =>
          val s = PorterStemmer.stem(t)
          if (s != t) Some((s, true)) else None
        }

    // per-term TFIDF lists; LinkedHashMap.put replicates HashMap-put
    // overwrite semantics with pinned (insertion-order) iteration
    val tfidfMap = mutable.LinkedHashMap.empty[String, IndexedSeq[(String, Double)]]
    for ((term, isStem) <- expanded if term.nonEmpty) {
      val list = getTfidf(term, n, isStem, index)
      if (list.nonEmpty) tfidfMap.put(term, list)
    }
    if (tfidfMap.isEmpty) return Nil

    // sum per url; TreeMap ⇒ url-asc iteration for the stable sort below
    val combined = mutable.TreeMap.empty[String, Double]
    for ((_, list) <- tfidfMap; (url, tfidf) <- list) {
      val s = pagerank match {
        case None     => 1.0 * tfidf
        case Some(pr) => 0.7 * tfidf + 0.3 * pr(url)
      }
      combined.update(url, combined.getOrElse(url, 0.0) + s)
    }

    // stable sort desc by score; ties keep TreeMap (url asc) order
    // (Backend.java:378, 502-510); final top-200 (Backend.java:408)
    combined.toList.sortBy { case (_, s) => -s }.take(200)
  }

  /** Backend.getTFIDF (Backend.java:205-314): idf with INT division, idf==0
    * drop, stem factor, stored-order consumption with 200-cap. */
  private def getTfidf(term: String, n: Int, isStem: Boolean,
                       index: Map[String, IndexedSeq[Posting]]): IndexedSeq[(String, Double)] = {
    val stemFactor = if (isStem) 0.7 else 1.0
    index.get(term) match {
      case None => IndexedSeq.empty
      case Some(posts) =>
        val df = posts.length
        val idf = customLog(500.0, (n / df).toDouble) // Java int division N/df
        if (idf == 0.0) return IndexedSeq.empty       // Backend.java:254-258
        val out = mutable.ArrayBuffer.empty[(String, Double)]
        try {
          var i = 0
          while (i < posts.length && out.length < 200) {
            val p = posts(i)
            // url hygiene filter (Backend.java:268-273): URL-decode, skip
            // empty/"null"/quoted/control-char urls BEFORE the 200-cap
            // counts; a malformed %-escape throws out of the loop and the
            // reference's catch returns an empty list for the whole term
            // (Backend.java:309-313). The decoded url is the combine key.
            val url = java.net.URLDecoder.decode(p.url.trim, "UTF-8")
            if (url != null && url.nonEmpty && url != "null" &&
                !url.contains("\"") && !url.exists(_ < ' ')) {
              out += ((url, p.tfn * idf * stemFactor))
            }
            i += 1
          }
        } catch { case _: Exception => return IndexedSeq.empty }
        out.toIndexedSeq
    }
  }
}
