package graft.query

import java.util.regex.Pattern

/** Result-detail surface of the serving tier: page title extraction, the
  * per-result info map, and the result-list JSON — replicating
  * backend/Backend.java:141-163, 416-482, 512-541, 613-655.
  */
object DocDetail {

  private val tags = Seq("title", "h1", "h2", "h3", "h4", "h5", "h6")
  private val tagPatterns: Seq[Pattern] =
    tags.map(t => Pattern.compile("<" + t + "(\\s+[^>]*?)?>(.*?)</" + t + ">"))

  /** First match among title,h1…h6 (attribute-tolerant), cleaned by the
    * reference's 5 regex passes (Backend.java:512-541). Null when no tag
    * matches. */
  def getTitle(page: String): String = {
    for (p <- tagPatterns) {
      val m = p.matcher(page)
      if (m.find()) {
        val title = m.group(2)
        val tagsRemoved = title.replaceAll("<.*?>", " ")
        val titleRemoved = tagsRemoved.replaceAll("[\f\b\t\r\n.,:;!?’'\"()-]", " ")
        val backslashRemoved = titleRemoved.replaceAll("\\\\", " ")
        val cntrlChrRemoved = backslashRemoved.replaceAll("[\\p{Cntrl}]", " ")
        val spaceRemoved = cntrlChrRemoved.replaceAll("\\s+", " ")
        return spaceRemoved.trim
      }
    }
    null
  }

  /** Per-result info map — live-code quirk preserved: the extracted title is
    * stored under "abstract" while "title" stays the url (the title-put is
    * commented out in the reference, Backend.java:462-476). */
  def pageInfo(url: String, page: Option[String]): Map[String, String] = {
    val base = Map("url" -> url, "title" -> url,
      "abstract" -> "No Information Available")
    // flatMap(Option(_)): a nullable html cell arrives as Some(null)
    page.flatMap(Option(_)).filter(_.nonEmpty) match {
      case None => base
      case Some(p) =>
        val t = getTitle(p)
        if (t != null && t.nonEmpty) base.updated("abstract", t) else base
    }
  }

  /** Ranked-result JSON array, hand-built exactly like Backend.java:613-635:
    * `[{"url":"…"},…]` (urls with quotes are filtered upstream by the
    * scorer, matching the reference's url filter). */
  def toJsonArray(ranked: List[(String, Double)]): String = {
    val sb = new StringBuilder("[")
    var first = true
    for ((url, _) <- ranked) {
      if (!first) sb.append(",")
      sb.append("{\"url\":\"").append(url).append("\"}")
      first = false
    }
    sb.append("]").toString
  }
}
