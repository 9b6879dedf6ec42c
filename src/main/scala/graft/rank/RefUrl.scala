package graft.rank

import scala.collection.mutable

/** PageRank's OWN link extraction / URL normalization, replicated from the
  * reference (jobs/PageRank.java:182-284 + tools/URLParser.java:8-31).
  * These differ from the crawler's implementations (jobs/Crawler.java) —
  * the reference builds its link graph with THESE, so rank reproduction
  * binds to them (SURVEY.md §2.4).
  */
object RefUrl {

  /** tools/URLParser.parseURL: (protocol, host, port, rest); nulls where the
    * reference leaves nulls. */
  def parseURL(url: String): Array[String] = {
    val result = new Array[String](4)
    val slashslash = url.indexOf("//")
    if (slashslash > 0) {
      result(0) = url.substring(0, slashslash - 1)
      val nextslash = url.indexOf('/', slashslash + 2)
      if (nextslash >= 0) {
        result(1) = url.substring(slashslash + 2, nextslash)
        result(3) = url.substring(nextslash)
      } else {
        result(1) = url.substring(slashslash + 2)
        result(3) = "/"
      }
      val colonPos = result(1).indexOf(':')
      if (colonPos > 0) {
        result(2) = result(1).substring(colonPos + 1)
        result(1) = result(1).substring(0, colonPos)
      }
    } else {
      result(3) = url
    }
    result
  }

  /** jobs/PageRank.extractURLs: scan every non-closing tag, take any
    * attribute token `href=X` (split on spaces then '='), strip X's first and
    * last characters (assumed quotes). */
  def extractURLs(s: String): List[String] = {
    val ans = mutable.ListBuffer.empty[String]
    var index = 0
    var done = false
    while (!done) {
      index = s.indexOf("<", index)
      if (index < 0) done = true
      else if (index + 1 < s.length && s.charAt(index + 1) == '/') index += 1
      else {
        val rightIndex = s.indexOf(">", index + 1)
        if (rightIndex < 0) done = true
        else {
          val content = s.substring(index + 1, rightIndex)
          val strs = content.split(" ")
          var i = 1
          while (i < strs.length) {
            val kv = strs(i).split("=")
            if (kv.length >= 2 && kv(0).toLowerCase == "href" && kv(1).length >= 2)
              ans += kv(1).substring(1, kv(1).length - 1)
            i += 1
          }
          index = rightIndex + 1
        }
      }
    }
    ans.toList
  }

  /** jobs/PageRank.normalizeURLs: #-strip (bare-fragment → null), default
    * port insertion for absolute http(s), path-stack `..` resolution for
    * relative forms against the seed's directory, host-absolute `/x` paths,
    * and the image/text extension blacklist. Returns null exactly where the
    * reference does. */
  def normalizeURLs(sIn: String, seedURL: String): String = {
    var s = sIn
    val indDoc = s.indexOf("#")
    if (indDoc >= 0) {
      if (indDoc == 0) return null
      s = s.substring(0, indDoc)
    }

    var ans = ""
    if (s.indexOf("://") >= 0) {
      val parsed = parseURL(s)
      val protocol = parsed(0); val shost = parsed(1)
      var port = parsed(2); val remain = parsed(3)
      if (protocol == null || shost == null || remain == null) return null
      if (port != null) ans = s
      else {
        if (protocol == "http") port = "80"
        else if (protocol == "https") port = "443"
        else return null
        ans = protocol + "://" + shost + ":" + port + remain
      }
    } else if (s.isEmpty) {
      return null
    } else if (s.charAt(0) != '/') {
      val path = mutable.ArrayBuffer.empty[String]
      val remain = parseURL(seedURL)(3)
      val strs = remain.split("/")
      var i = 1
      while (i < strs.length - 1) { path += strs(i); i += 1 }
      val strs2 = s.split("/")
      var j = 0
      while (j < strs2.length) {
        if (strs2(j) != "..") path += strs2(j)
        else {
          if (path.isEmpty) return null
          path.remove(path.size - 1)
        }
        j += 1
      }
      val seed = parseURL(seedURL)
      ans = seed(0) + "://" + seed(1) + ":" + seed(2)
      for (e <- path) ans += "/" + e
    } else {
      val seed = parseURL(seedURL)
      ans = seed(0) + "://" + seed(1) + ":" + seed(2) + s
    }

    if (ans.endsWith(".jpg") || ans.endsWith(".jpeg") || ans.endsWith(".gif") ||
        ans.endsWith(".png") || ans.endsWith(".txt")) null
    else ans
  }

  /** Self-URL normalization at graph init (jobs/PageRank.java:31-49):
    * strip fragment, insert default port; non-http(s) pages are dropped
    * (the reference returns a null pair there). Returns null on drop. */
  def selfNormalize(uIn: String): String = {
    var u = uIn
    val indDoc = u.indexOf("#")
    if (indDoc >= 0) u = u.substring(0, indDoc)
    val parsed = parseURL(u)
    if (parsed(2) != null) u
    else {
      val protocol = parsed(0); val shost = parsed(1); val remain = parsed(3)
      val port =
        if (protocol == "http") "80"
        else if (protocol == "https") "443"
        else return null
      protocol + "://" + shost + ":" + port + remain
    }
  }

  /** Init-time outlink set for one page: extract → normalize → dedupe in
    * first-seen order (jobs/PageRank.java:53-64). */
  def outlinks(selfUrl: String, page: String): List[String] = {
    val visited = mutable.LinkedHashSet.empty[String]
    for (e <- extractURLs(page)) {
      val n = normalizeURLs(e, selfUrl)
      if (n != null) visited += n
    }
    visited.toList
  }
}
