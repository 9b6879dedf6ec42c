package graft.crawl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class CanonicalUrlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("canonical-url-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("u").select(CanonicalUrl.canonicalize(col("u"))).as[String]
      .collect().toSeq
  }

  test("drops fragments, tracking params, and sorts survivors") {
    assert(canon(
      "http://a.com/p?utm_source=x&id=3",
      "http://a.com/p?id=3&utm_campaign=y#frag",
      "http://a.com/p?b=2&id=3",
      "http://a.com/p?id=3&b=2",
      "http://a.com/p?fbclid=abc",
      "http://a.com/p#only-frag",
      "http://a.com/p") == Seq(
      "http://a.com/p?id=3",
      "http://a.com/p?id=3",
      "http://a.com/p?b=2&id=3",
      "http://a.com/p?b=2&id=3",
      "http://a.com/p",
      "http://a.com/p",
      "http://a.com/p"))
  }

  test("utm_ is a prefix match, ref is exact — refresh=1 survives") {
    assert(canon("http://a.com/p?utm_x=1&refresh=1&ref=tw") ==
      Seq("http://a.com/p?refresh=1"))
  }

  test("keeper is the min url of each canonical group") {
    import spark.implicits._
    val got = CanonicalUrl.withKeeper(Seq(
        "http://a.com/p?id=3&utm_source=x",
        "http://a.com/p?id=3",
        "http://b.com/q").toDF("url"), "url")
      .as[(String, String, String)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got == Map(
      "http://a.com/p?id=3&utm_source=x" -> "http://a.com/p?id=3",
      "http://a.com/p?id=3" -> "http://a.com/p?id=3",
      "http://b.com/q" -> "http://b.com/q"))
  }
}
