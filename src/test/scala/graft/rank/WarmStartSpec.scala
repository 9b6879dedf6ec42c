package graft.rank

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Warm-start iteration: seeded ranks continue the SAME algebra, new
  * nodes seed at the reference init 1.0, and on an unchanged graph a
  * warm start is exactly "more iterations of the cold run". */
class WarmStartSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("warmstart-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val state = PageRank.init(spark,
    graft.corpus.Corpus.generate(spark, 120)).cache()

  test("unchanged graph: cold 8 iterations == cold 5 then warm 3") {
    val (cold8, _) = PageRank.run(spark, state, -1.0, 2.0, maxIter = 8)
    val (cold5, _) = PageRank.run(spark, state, -1.0, 2.0, maxIter = 5)
    val (warm, it) = PageRank.warmStart(spark, state, cold5, -1.0, 2.0, maxIter = 3)
    assert(it == 3)
    val want = cold8.collect().map(r => r.url -> r.rank).toMap
    warm.collect().foreach { r =>
      assert(math.abs(r.rank - want(r.url)) < 1e-9,
        s"${r.url}: warm ${r.rank} vs cold ${want(r.url)}")
    }
  }

  test("a node absent from the previous ranks seeds at 1.0") {
    import spark.implicits._
    // two-node graph a->b; previous ranks only know a
    val st = Seq(
      RankState("a", 1.0, 1.0, Seq("b")),
      RankState("b", 1.0, 1.0, Seq())).toDS()
    val prev = Seq(PageRankResult("a", 0.4)).toDS()
    val (got, _) = PageRank.warmStart(spark, st, prev, -1.0, 2.0, maxIter = 1)
    val m = got.collect().map(r => r.url -> r.rank).toMap
    // b starts at 1.0 (absent from prev) but after 1 iter gets a's mass:
    // 0.85 * 0.4 / 1 + 0.15; a gets keep-alive only: 0.15
    assert(math.abs(m("b") - (0.85 * 0.4 + 0.15)) < 1e-12)
    assert(math.abs(m("a") - 0.15) < 1e-12)
  }
}
