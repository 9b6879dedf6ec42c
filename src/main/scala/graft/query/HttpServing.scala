package graft.query

import java.net.InetSocketAddress
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** The reference Backend's HTTP surface (reference
  * backend/Backend.java:30-163) bound over the NO-SPARK-JOB direct tier —
  * the last piece of the switch-over story: a reference user points their
  * frontend at this port and gets byte-identical response bodies served
  * from [[DirectSearcher]]/[[DirectPages]]/[[DirectRanks]] mmap point reads
  * with no job scheduler (and no Spark session) anywhere in the request
  * path.
  *
  * Routes, replicated from the reference:
  *  - `GET /`            → the hello page (Backend.java:36-38);
  *  - `GET /query?query=…` → the ranked-result JSON array
  *    ([[Serving.searchJson]]; Content-Type: application/json,
  *    Backend.java:40-139);
  *  - `GET /query/:url`  → the page-info JSON object (the :url path segment
  *    is URL-decoded exactly like Backend.java:143-148, then
  *    [[DirectPages.detailJson]]).
  *
  * Differences, deliberate and small: a missing `query` parameter serves
  * the empty query's result list (the reference logs "query is null" and
  * then NPEs inside parseQuery — replicating a 500 helps nobody), a
  * malformed %-escape in either decode position returns 400 Bad Request
  * (the reference's framework would 500 on the decoder throw), and
  * unknown paths return 404 where the reference's framework returns its own
  * error page. Everything with a body is byte-for-byte [[Serving]] output.
  *
  * Built on the JDK's own `com.sun.net.httpserver` (no new dependency);
  * requests are served on a small fixed pool — the underlying direct tiers
  * are thread-safe (absolute buffer gets only). */
final class HttpServing private (server: HttpServer,
                                 pool: java.util.concurrent.ExecutorService) {
  /** The bound port (useful with `port = 0` auto-assignment). */
  def port: Int = server.getAddress.getPort

  def stop(): Unit = {
    server.stop(0)
    pool.shutdownNow()
    ()
  }
}

object HttpServing {

  /** Start serving on `port` (0 = any free port). `ranks` enables the
    * backup scorer's 0.7/0.3 PageRank blend, like every other tier. */
  def start(searcher: DirectSearcher, pages: DirectPages,
            ranks: Option[DirectRanks] = None, port: Int = 0): HttpServing = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    server.setExecutor(pool)
    val pr = ranks.map(_.prFunction)

    def respond(ex: HttpExchange, status: Int, body: String,
                contentType: String): Unit = {
      val bytes = body.getBytes("UTF-8")
      ex.getResponseHeaders.set("Content-Type", contentType)
      ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length.toLong)
      if (bytes.nonEmpty) {
        val os = ex.getResponseBody
        try os.write(bytes) finally os.close()
      }
      ex.close()
    }

    /** `query` parameter of an x-www-form-urlencoded query string — the
      * decode the reference's framework applies to queryParams(). */
    def queryParam(rawQuery: String): Option[String] =
      Option(rawQuery).iterator.flatMap(_.split("&"))
        .map(_.split("=", 2))
        .collectFirst { case Array("query", v) =>
          java.net.URLDecoder.decode(v, "UTF-8")
        }

    server.createContext("/", (ex: HttpExchange) => {
      try {
        val path = ex.getRequestURI.getRawPath
        if (ex.getRequestMethod != "GET") respond(ex, 405, "", "text/plain")
        else if (path == "/")
          respond(ex, 200, "<html>" + "<h2>HELLO</h2>" + "</html>", "text/html")
        else if (path == "/query") {
          // a malformed %-escape is a CLIENT error — 400, not the generic
          // 500; the try wraps ONLY the decode, so a server-side IAE from
          // the serve path still surfaces as the logged 500 below
          val q =
            try Right(queryParam(ex.getRequestURI.getRawQuery).getOrElse(""))
            catch { case _: IllegalArgumentException => Left(()) }
          q match {
            case Right(query0) =>
              val body = Serving.searchJson(query => searcher.referenceTopK(query, pr), query0)
              respond(ex, 200, body, "application/json")
            case Left(_) => respond(ex, 400, "", "text/plain")
          }
        } else if (path.startsWith("/query/")) {
          // the :url path parameter, URL-decoded like Backend.java:148
          val u =
            try Right(java.net.URLDecoder.decode(path.stripPrefix("/query/"), "UTF-8"))
            catch { case _: IllegalArgumentException => Left(()) }
          u match {
            case Right(url) => respond(ex, 200, pages.detailJson(url), "application/json")
            case Left(_)    => respond(ex, 400, "", "text/plain")
          }
        } else respond(ex, 404, "", "text/plain")
      } catch {
        case e: Exception =>
          // a failed request must not kill the handler thread silently
          System.err.println(s"[http-serving] ${ex.getRequestURI}: $e")
          try respond(ex, 500, "", "text/plain") catch { case _: Exception => () }
      }
    })
    server.start()
    new HttpServing(server, pool)
  }
}
