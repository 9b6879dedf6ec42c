package graft.rank

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Bibliographic coupling on a handcrafted graph: pair counts, hub-target
  * cap, duplicate-edge collapse. */
class RelatedPagesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("related-pages-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("shared-outlink counts with hub cap and duplicate edges") {
    import spark.implicits._
    val edges = Seq(
      ("a", "t1"), ("a", "t2"), ("a", "t2"), // dup edge counts once
      ("b", "t1"), ("b", "t2"),
      ("c", "t1"),
      // t_hub is cited by everyone -> dropped at maxIndegree=3
      ("a", "t_hub"), ("b", "t_hub"), ("c", "t_hub"), ("d", "t_hub")
    ).toDF("src", "dst")
    val got = RelatedPages.biblioCoupling(edges, maxIndegree = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("a", "b", 2L),   // t1 + t2 (dup collapsed; t_hub excluded)
      ("a", "c", 1L),   // t1
      ("b", "c", 1L)))  // t1; d pairs with no one once the hub is dropped
  }

  test("without the cap the hub manufactures pairs — cap is load-bearing") {
    import spark.implicits._
    val edges = Seq(
      ("a", "t_hub"), ("b", "t_hub"), ("c", "t_hub"), ("d", "t_hub")
    ).toDF("src", "dst")
    assert(RelatedPages.biblioCoupling(edges, maxIndegree = 3, k = 10)
      .count() == 0)
    assert(RelatedPages.biblioCoupling(edges, maxIndegree = 10, k = 10)
      .count() == 6) // C(4,2) all-pairs explosion the cap prevents
  }
}
