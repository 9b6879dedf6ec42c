package graft.query

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class EvalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("eval-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def log2(x: Double) = math.log(x) / math.log(2.0)

  test("NDCG@k and MRR match a literal computation, unlabeled = rel 0") {
    import spark.implicits._
    // q1: rels at ranks 1..4 = (3, 0[unlabeled], 2, 1); rank 5 beyond k=4
    val run = Seq((1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "d"), (1, 5, "e"))
      .toDF("query_id", "rank", "url")
    val labels = Seq((1, "a", 3), (1, "c", 2), (1, "d", 1), (1, "e", 3))
      .toDF("query_id", "url", "rel")
    val r = Eval.ndcgMrr(run, labels, k = 4, relThreshold = 2).head()
    val gains = Seq(7.0, 0.0, 3.0, 1.0) // (2^rel - 1) at ranks 1..4
    val dcg = gains.zipWithIndex.map { case (g, i) => g / log2(i + 2.0) }.sum
    val ideal = gains.sorted.reverse
    val idcg = ideal.zipWithIndex.map { case (g, i) => g / log2(i + 2.0) }.sum
    assert(r.getLong(1) == 2L) // two results at rel >= 2 inside k
    assert(math.abs(r.getDouble(2) - math.rint(dcg / idcg * 1e6) / 1e6) < 1e-12)
    assert(r.getDouble(3) == 1.0) // first rel>=2 at rank 1
  }

  test("MRR finds the first threshold hit; no hit → 0; empty idcg → ndcg 0") {
    import spark.implicits._
    val run = Seq((1, 1, "a"), (1, 2, "b"), (1, 3, "c"),
      (2, 1, "x"), (2, 2, "y")).toDF("query_id", "rank", "url")
    val labels = Seq((1, "c", 2)).toDF("query_id", "url", "rel")
    val rows = Eval.ndcgMrr(run, labels, k = 10).collect()
      .map(r => r.getInt(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(rows(1)._2 == math.rint(1.0 / 3.0 * 1e6) / 1e6)
    assert(rows(2) == ((0.0, 0.0))) // nothing labeled → idcg 0 → ndcg 0
  }

  test("a perfect ranking scores NDCG 1") {
    import spark.implicits._
    val run = Seq((1, 1, "a"), (1, 2, "b"), (1, 3, "c"))
      .toDF("query_id", "rank", "url")
    val labels = Seq((1, "a", 3), (1, "b", 2), (1, "c", 1))
      .toDF("query_id", "url", "rel")
    assert(Eval.ndcgMrr(run, labels).head().getDouble(2) == 1.0)
  }
}
