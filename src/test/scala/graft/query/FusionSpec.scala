package graft.query

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class FusionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("fusion-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fuse(rows: Seq[(String, String, String, Int)], k0: Int, k: Int) = {
    import spark.implicits._
    Fusion.rrf(rows.toDF("query_id", "system", "url", "rank"), k0, k)
      .as[(String, String, Int, Double)].collect().toSeq
      .sortBy(r => (r._1, r._3))
  }

  test("matches a literal RRF computation with pinned tie order") {
    val runs = Seq(
      ("q1", "bm25", "a", 1), ("q1", "bm25", "b", 2), ("q1", "bm25", "c", 3),
      ("q1", "ref", "b", 1), ("q1", "ref", "a", 2), ("q1", "ref", "d", 3))
    val got = fuse(runs, k0 = 60, k = 10)
    def r(ranks: Int*) = {
      val raw = ranks.map(x => 1.0 / (60 + x)).sum
      math.rint(raw * 1e6) / 1e6
    }
    // a: 1/61+1/62, b: 1/62+1/61 (identical) -> tie broken url-asc
    assert(got == Seq(
      ("q1", "a", 1, r(1, 2)), ("q1", "b", 2, r(1, 2)),
      ("q1", "c", 3, r(3)), ("q1", "d", 4, r(3))))
  }

  test("fold order is pinned: same result at any input ordering") {
    val runs = (0 until 8).flatMap(sysI => (1 to 30).map(rk =>
      ("q1", s"sys$sysI", s"u${(rk * 7 + sysI * 13) % 40}", rk)))
    val a = fuse(runs, 60, 40)
    val b = fuse(scala.util.Random.shuffle(runs.toList), 60, 40)
    assert(a == b)
  }

  test("top-k cap and bad args are loud") {
    val runs = Seq(("q1", "s", "a", 1), ("q1", "s", "b", 2), ("q1", "s", "c", 3))
    assert(fuse(runs, 60, 2).map(_._2) == Seq("a", "b"))
    intercept[IllegalArgumentException](fuse(runs, 0, 2))
    intercept[IllegalArgumentException](fuse(runs, 60, 0))
  }
}
