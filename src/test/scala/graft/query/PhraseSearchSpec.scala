package graft.query

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Phrase search must count EXACT token-sequence occurrences — including
  * self-overlapping ones — and rank (count desc, id asc). */
class PhraseSearchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("phrase-search-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(rows: Seq[(Long, String)], phrase: Seq[String], k: Int = 10) = {
    import spark.implicits._
    val pos = PhraseSearch.positions(rows.toDF("doc_id", "text"), "doc_id", "text")
    PhraseSearch.topK(pos, phrase, k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
  }

  test("counts exact occurrences, overlapping included, ranked desc then id asc") {
    val rows = Seq(
      (0L, "x table hash y table hash"),   // 2 occurrences
      (1L, "table hash z"),                // 1
      (2L, "hash table"),                  // reversed → 0
      (3L, "table x hash"),                // gap → 0
      (4L, "TABLE Hash"),                  // case-folded → 1
      (5L, "a a a a"))                     // unrelated
    assert(run(rows, Seq("table", "hash")) == Seq((0L, 2L), (1L, 1L), (4L, 1L)))
    // self-overlapping 3-term phrase: "a a a" occurs at starts 0 and 1
    assert(run(rows, Seq("a", "a", "a")) == Seq((5L, 2L)))
  }

  test("k caps the result and single-term phrase is a posting count") {
    val rows = (0L until 6L).map(i => (i, ("w " * (i + 1).toInt).trim))
    val out = run(rows, Seq("w"), k = 3)
    assert(out == Seq((5L, 6L), (4L, 5L), (3L, 4L)))
  }
}
