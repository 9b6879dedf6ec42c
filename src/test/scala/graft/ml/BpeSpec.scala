package graft.ml

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("bpe-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // Sennrich's canonical example vocabulary
  private val words = Seq(("l o w", 5L), ("l o w e r", 2L),
    ("n e w e s t", 6L), ("w i d e s t", 3L))

  private def run(ws: Seq[(String, Long)], rounds: Int) =
    Bpe.trainMerges(spark, ws.toDF("w", "freq"), rounds)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)

  test("reproduces the canonical merge sequence") {
    val got = run(words, 4)
    // es(9) → est(9) → lo(7) → low(7): the textbook result
    assert(got == Seq((1, "e", "s", 9L), (2, "es", "t", 9L),
      (3, "l", "o", 7L), (4, "lo", "w", 7L)))
  }

  test("greedy left-to-right, non-overlapping: aaa merges once") {
    val got = run(Seq(("a a a", 10L)), 1)
    assert(got == Seq((1, "a", "a", 20L))) // two adjacent pairs counted
    // after the merge the word is ["aa","a"]: round 2's top pair is (aa, a)
    val two = run(Seq(("a a a", 10L)), 2)
    assert(two(1) == ((2, "aa", "a", 10L)))
  }

  test("boundary-exact fold: a token ENDING in l does not merge") {
    // word "xa b": pair (a, b) must NOT merge inside it when the rule is
    // (a, b), because the last token is "xa", not "a"
    val got = run(Seq(("x a b", 1L), ("a b", 5L), ("xa b", 4L)), 1)
    assert(got.head._2 == "a" && got.head._3 == "b" && got.head._4 == 6L)
  }

  test("stops early when fully merged") {
    val got = run(Seq(("a b", 1L)), 5)
    assert(got.size == 1) // one merge exhausts the only pair
  }
}
