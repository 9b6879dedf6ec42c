package graft.query

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deletion-neighborhood candidates + verify must equal the naive
  * quadratic Levenshtein join exactly. */
class TermNeighborsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("term-neighbors-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("equals the naive all-pairs levenshtein join; false candidates die") {
    import spark.implicits._
    // ab/ba share deletion variant "b" but are distance 2 — the classic
    // false candidate; mixed lengths cover insert/delete/substitute
    val vocab = Seq("ab", "ba", "cat", "cats", "cart", "bat", "hat",
      "hats", "chat", "table", "cable", "tables", "stable", "xyz")
      .zipWithIndex.map { case (t, i) => (t, (i + 1).toLong) }
      .toDF("term", "df")
    val got = TermNeighbors.editDistance1(vocab, minLen = 1)
      .select("term_a", "term_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val v = vocab.select(col("term").as("term_a"))
    val naive = v.crossJoin(vocab.select(col("term").as("term_b")))
      .filter(col("term_a") < col("term_b") &&
        levenshtein(col("term_a"), col("term_b")) === 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == naive)
    assert(!got.contains(("ab", "ba")))          // false candidate rejected
    assert(got.contains(("cat", "cats")))        // insertion
    assert(got.contains(("bat", "cat")))         // substitution
    assert(got.contains(("table", "tables")))    // suffix insert
    assert(got.contains(("stable", "tables")) == false) // anagram, dist 2
  }

  test("minLen floor drops short terms from BOTH sides of every pair") {
    import spark.implicits._
    val vocab = Seq(("ab", 1L), ("abc", 2L), ("abcd", 3L)).toDF("term", "df")
    val got = TermNeighbors.editDistance1(vocab, minLen = 3)
      .select("term_a", "term_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("abc", "abcd"))) // (ab, abc) gone with the floor
  }

  test("df columns ride along with their terms") {
    import spark.implicits._
    val vocab = Seq(("cat", 7L), ("cats", 9L)).toDF("term", "df")
    val rows = TermNeighbors.editDistance1(vocab).collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert((r.getAs[String]("term_a"), r.getAs[Long]("df_a"),
      r.getAs[String]("term_b"), r.getAs[Long]("df_b")) ==
      ("cat", 7L, "cats", 9L))
  }
}
