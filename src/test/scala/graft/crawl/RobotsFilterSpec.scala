package graft.crawl

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** First matching rule in file order must win, unmatched paths default to
  * allowed, rules are per-host isolated, and the glob semantics are the
  * golden reference ones (anchored full match — a bare prefix rule does
  * NOT match longer paths without a '*'). */
class RobotsFilterSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("robots-filter-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("first match wins; anchored; per-host; default allow") {
    import spark.implicits._
    val rules = Seq(
      ("a.com", 0, "allow", "/p/12*"),
      ("a.com", 1, "disallow", "/p/1*"),
      ("a.com", 2, "disallow", "/secret"),
      ("b.com", 0, "disallow", "/*")) // b.com blocks everything
      .toDF("host", "idx", "rtype", "rule")
    val frontier = Seq(
      ("a.com", "/p/123"),   // allow idx0 beats disallow idx1
      ("a.com", "/p/19"),    // disallow idx1
      ("a.com", "/secret"),  // exact disallow
      ("a.com", "/secret/x"),// anchored: '/secret' does NOT match longer path → allow
      ("a.com", "/other"),   // no rule → allow
      ("b.com", "/p/123"))   // host isolation: b.com's catch-all
      .toDF("host", "path")
    val got = RobotsFilter.allowed(frontier, rules)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getBoolean(2)).toMap
    assert(got == Map(
      ("a.com", "/p/123") -> true,
      ("a.com", "/p/19") -> false,
      ("a.com", "/secret") -> false,
      ("a.com", "/secret/x") -> true,
      ("a.com", "/other") -> true,
      ("b.com", "/p/123") -> false))
  }

  test("unknown rule type is refused loudly") {
    import spark.implicits._
    val bad = Seq(("a.com", 0, "deny", "/x")).toDF("host", "idx", "rtype", "rule")
    val f = Seq(("a.com", "/x")).toDF("host", "path")
    val e = intercept[IllegalArgumentException](RobotsFilter.allowed(f, bad))
    assert(e.getMessage.contains("unknown rule types"))
  }
}
