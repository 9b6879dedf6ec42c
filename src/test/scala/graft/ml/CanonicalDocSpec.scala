package graft.ml

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class CanonicalDocSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("canonical-doc-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import org.apache.spark.sql.functions._

  // cluster 1: {1,2,3} lens 5,9,9 → canonical 2 (longest, id-asc tie vs 3)
  // cluster 2: {10,11} lens 4,4 → canonical 10; 99 is a singleton
  private val docs = Seq((1L, 5L), (2L, 9L), (3L, 9L), (10L, 4L),
    (11L, 4L), (99L, 7L))
  private val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))

  private def run() = {
    import spark.implicits._
    CanonicalDoc.survivorMap(docs.toDF("doc_id", "len"),
        comps.toDF("doc_id", "component"))
      .as[(Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
  }

  test("longest wins, id-asc ties, singletons self-canonical") {
    assert(run() == Seq(
      (1L, 2L, false), (2L, 2L, true), (3L, 2L, false),
      (10L, 10L, true), (11L, 10L, false),
      (99L, 99L, true)))
  }

  test("canonical ids are fixpoints: exactly one per cluster") {
    val m = run()
    val canon = m.filter(_._3).map(_._1).toSet
    assert(m.forall(r => canon.contains(r._2)))
    assert(m.count(_._3) == 3) // two clusters + one singleton
  }

  test("phantom component members absent from docs never become canonical") {
    import spark.implicits._
    // component says doc 500 is in cluster 1, but docs has no 500
    val extra = comps :+ (500L, 1L)
    val got = CanonicalDoc.survivorMap(docs.toDF("doc_id", "len"),
        extra.toDF("doc_id", "component"))
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(!got.exists(_._1 == 500L))
    assert(got.find(_._1 == 1L).get._2 == 2L)
  }
}
