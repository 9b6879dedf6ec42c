package graft.query

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class FacetsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("facets-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("counts, best rank, deterministic facet order, k cut") {
    import spark.implicits._
    val serp = Seq(
      // q0: a.com ×3 (best rank 1), b.com ×2 (best 2), c.com ×1 (best 6)
      (0, 1, "http://a.com/x", 9.0), (0, 2, "http://b.com/x", 8.0),
      (0, 3, "http://a.com/y", 7.0), (0, 4, "http://b.com/y", 6.0),
      (0, 5, "http://a.com/z", 5.0), (0, 6, "http://c.com/x", 4.0),
      // q1: tie on count (1 each) → ordered by best_rank, then host
      (1, 1, "http://z.org/a", 3.0), (1, 2, "http://m.org/a", 2.0)
    ).toDF("qid", "rank", "url", "score")

    val got = Facets.hostFacets(serp, k = 2)
      .select("qid", "host", "n_results", "best_rank", "facet_rank")
      .as[(Int, String, Long, Int, Int)].collect().sorted.toSeq
    assert(got == Seq(
      (0, "a.com", 3L, 1, 1), (0, "b.com", 2L, 2, 2),
      (1, "m.org", 1L, 2, 2), (1, "z.org", 1L, 1, 1)))
  }

  test("port-qualified hosts stay distinct from their bare host") {
    import spark.implicits._
    val serp = Seq(
      (0, 1, "http://a.com:8080/x", 2.0),
      (0, 2, "http://a.com/x", 1.0)).toDF("qid", "rank", "url", "score")
    val hosts = Facets.hostFacets(serp, k = 5)
      .select("host").as[String].collect().sorted.toSeq
    assert(hosts == Seq("a.com", "a.com:8080"))
  }
}
