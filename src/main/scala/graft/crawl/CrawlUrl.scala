package graft.crawl

import java.util.regex.Pattern
import scala.collection.mutable
import graft.rank.RefUrl

/** The CRAWLER's URL/HTML processing functions — deliberately a separate
  * implementation from PageRank's ([[graft.rank.RefUrl]]): the reference has
  * two divergent code paths (SURVEY.md §2.4) and the capability surface
  * includes both. Replicated from jobs/Crawler.java:278-484.
  */
object CrawlUrl {

  /** Crawler link extraction (jobs/Crawler.java:423-455): split on '<',
    * tags starting with "a", take href="…", skip media/text extensions,
    * cap 50 links per page. */
  def extracturl(html: String): List[String] = {
    val out = mutable.ListBuffer.empty[String]
    val tags = html.split("<")
    var i = 0
    var done = false
    while (i < tags.length && !done) {
      val tag = tags(i).trim
      if (tag.nonEmpty && tag.startsWith("a")) {
        val hrefIndex = tag.indexOf("href=\"")
        if (hrefIndex != -1) {
          val urlStart = hrefIndex + 6
          val urlEnd = tag.indexOf("\"", urlStart)
          if (urlEnd != -1) {
            val u = tag.substring(urlStart, urlEnd)
            val skip = u.endsWith(".jpg") || u.endsWith(".jpeg") || u.endsWith(".gif") ||
              u.endsWith(".png") || u.endsWith(".txt") || u.endsWith(".ico")
            if (!skip) {
              out += u
              if (out.size >= 50) done = true // jobs/Crawler.java:447
            }
          }
        }
      }
      i += 1
    }
    out.toList
  }

  /** Crawler default-port insertion (jobs/Crawler.java:278-306): returns
    * "protocol://host[:port]" or null for non-http(s)/hostless urls. */
  def addDefaultPortIfNeeded(parsedUrl: Array[String]): String = {
    val protocol = parsedUrl(0); val host = parsedUrl(1)
    var port = parsedUrl(2)
    if (protocol == null || protocol.isEmpty || host == null || host.isEmpty ||
        (!protocol.equalsIgnoreCase("http") && !protocol.equalsIgnoreCase("https")))
      return null
    if (port == null || port.isEmpty) {
      port = if (protocol.equalsIgnoreCase("http")) "80" else "443"
    }
    var fullUrl = protocol + "://" + host
    if (port != null && port.nonEmpty) fullUrl += ":" + port
    fullUrl
  }

  /** Crawler URL normalization (jobs/Crawler.java:308-367), distinct from
    * PageRank's: string-scan `..` squashing with '/'-guard, `beforepath` =
    * "proto://host:port", `path` = base directory of the referring page. */
  def normalizeurl(beforepath: String, path: String, rawurlIn: String): String = {
    if (rawurlIn == null) return null
    var rawurl = rawurlIn
    val fragmentIndex = rawurl.indexOf("#")
    if (fragmentIndex != -1) rawurl = rawurl.substring(0, fragmentIndex)
    if (rawurl == "") return null
    val s = RefUrl.parseURL(rawurl)
    if (s(0) != null && s(1) != null) {
      val proto = s(0).toLowerCase
      if (proto == "http" || proto == "https") {
        if (s(2) != null) return rawurl
        else if (proto == "http") return s(0) + "://" + s(1) + ":80" + s(3)
        else return s(0) + "://" + s(1) + ":443" + s(3)
      } else return null
    }
    if (s(0) != null || s(1) != null) return null // lacks protocol or host
    rawurl = if (rawurl.startsWith("/")) beforepath + rawurl else beforepath + path + rawurl
    var loop = true
    while (loop && rawurl.contains("..")) {
      val index = rawurl.indexOf("..")
      val isValid = index > 0 && rawurl.charAt(index - 1) == '/' &&
        index + 2 < rawurl.length && rawurl.charAt(index + 2) == '/'
      if (!isValid) loop = false
      else {
        val slashIndex = rawurl.lastIndexOf('/', index - 2)
        if (slashIndex != -1)
          rawurl = rawurl.substring(0, slashIndex) + rawurl.substring(index + 3)
        else loop = false
      }
    }
    rawurl
  }

  /** robots.txt Allow/Disallow glob match (jobs/Crawler.java:411-422):
    * regex specials escaped, '*' → '.*', anchored. */
  def ruleToRegex(rule: String): String = {
    val escaped = rule.replaceAll("([\\[\\](){}+.^$|])", "\\\\$1")
    "^" + escaped.replaceAll("\\*", ".*") + "$"
  }

  def regexCheck(path: String, rule: String): Boolean =
    Pattern.matches(ruleToRegex(rule), path)

  /** HTML-likeness extension filter (jobs/Crawler.java:481-484). */
  def isLikelyHtmlUrl(url: String): Boolean =
    !url.matches(".*\\.(jpg|jpeg|gif|png|txt|ico|pdf|doc|docx|ppt|pptx|xls|xlsx|zip|rar|mp3|mp4)$")
}
