package graft.query

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExpandedSearchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("expanded-search-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Fixture: "aaa" in u1..u6. "bbb" co-occurs on 5 docs with df 5 →
    * ratio 5/(6·5). "ddd" also co-occurs on 5 docs but df 10 → ratio
    * 5/(6·10), loses. "ccc" co-occurs on only 4 docs → under minPairs. */
  private def triples = {
    import spark.implicits._
    val rows =
      (1 to 6).map(i => (s"u$i", "aaa", 2)) ++
      (1 to 5).map(i => (s"u$i", "bbb", 1)) ++
      (1 to 4).map(i => (s"u$i", "ccc", 1)) ++
      (1 to 5).map(i => (s"u$i", "ddd", 1)) ++
      (7 to 11).map(i => (s"u$i", "ddd", 3))
    rows.toDF("url", "term", "tf")
  }

  private def run(minPairs: Long): List[(String, Double)] =
    ExpandedSearch.topK(spark, triples, 20, "aaa", minPairs = minPairs)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toList

  private def manual(weights: Seq[(String, Double)]): List[(String, Double)] = {
    import org.apache.spark.sql.functions._
    val terms = weights.map(_._1)
    val dict = triples.where(col("term").isin(terms: _*))
      .groupBy("term").agg(count(lit(1)).as("df"), max(col("tf")).as("max_tf"))
    ShardedSearch.scoreCandidates(
      triples.where(col("term").isin(terms: _*)), dict, weights, 20, 200)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toList
  }

  test("picks the highest-ratio co-occurring term at the discount factor") {
    // expected expansion: aaa@1.0 then bbb@0.5 (ddd loses on df, ccc on
    // minPairs) — result must equal the manually-expanded scorer exactly
    assert(run(minPairs = 5) == manual(Seq(("aaa", 1.0), ("bbb", 0.5))))
  }

  test("no candidate over minPairs → plain unexpanded scoring") {
    assert(run(minPairs = 6) == manual(Seq(("aaa", 1.0))))
  }

  test("empty query returns empty") {
    assert(ExpandedSearch.topK(spark, triples, 20, "").collect().isEmpty)
  }
}
