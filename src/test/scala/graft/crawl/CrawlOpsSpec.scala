package graft.crawl

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** RecrawlDelta classification semantics and Frontier politeness-queue
  * assignment (host extraction, budget cap, priority order). */
class CrawlOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("crawl-ops-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("recrawl delta: all four classes, fingerprint not text equality") {
    import spark.implicits._
    val oldSnap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val newSnap = Seq((2L, "b"), (3L, "C"), (4L, "d")).toDF("doc_id", "text")
    val got = RecrawlDelta.diff(oldSnap, newSnap, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "removed"), (2L, "unchanged"),
      (3L, "changed"), (4L, "added")))
  }

  test("recrawl delta: NULL text is presence, not absence") {
    import spark.implicits._
    val o = Seq((1L, None: Option[String]), (2L, None: Option[String]),
      (3L, Some("x"))).toDF("doc_id", "text")
    val n = Seq((1L, Some("now set")), (2L, None: Option[String]),
      (3L, None: Option[String])).toDF("doc_id", "text")
    val got = RecrawlDelta.diff(o, n, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "changed"),     // null -> text, key present in both
      (2L, "unchanged"),                   // null -> null
      (3L, "changed")))                    // text -> null
  }

  test("recrawl delta: invariant under partitioning") {
    import spark.implicits._
    val o = (1 to 200).map(i => (i.toLong, s"text $i")).toDF("doc_id", "text")
    val n = (51 to 250).map(i =>
      (i.toLong, if (i % 3 == 0) s"text $i!" else s"text $i"))
      .toDF("doc_id", "text")
    val a = RecrawlDelta.diff(o, n, "doc_id", "text")
      .collect().map(_.toString).sorted
    val b = RecrawlDelta.diff(o.repartition(11), n.repartition(5),
      "doc_id", "text").collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("frontier: host strips port+path, cap bites, priority desc url asc") {
    import spark.implicits._
    val urls = Seq(
      ("http://a.example/p/1", 5L),
      ("http://a.example:443/p/2", 9L),  // same host as above (port ignored)
      ("http://a.example/p/3", 9L),      // indegree tie -> url asc
      ("http://b.example/p/4", 0L)
    ).toDF("url", "indegree")
    val got = Frontier.schedule(urls, "url", "indegree", maxPerHost = 2)
      .collect().map(r => (r.getString(0), r.getString(2), r.getInt(3))).toSet
    assert(got == Set(
      ("http://a.example/p/3", "a.example", 1),      // tie: '/p/3' < ':443/p/2'
      ("http://a.example:443/p/2", "a.example", 2),
      ("http://b.example/p/4", "b.example", 1)))
    // p/1 (lowest priority on the 3-url host) fell past the cap
  }
}
