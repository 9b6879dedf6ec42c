package graft.query

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class Bm25fSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("bm25f-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // (doc, field, term, tf) rows for a tiny corpus
  private val rows = Seq(
    (1L, "head", "scan", 1), (1L, "body", "scan", 3), (1L, "body", "row", 5),
    (2L, "body", "scan", 4), (2L, "body", "filter", 2), (2L, "head", "row", 1),
    (3L, "head", "filter", 2), (3L, "body", "other", 7))

  private def brute(query: Seq[String], w: Map[String, (Double, Double)],
                    k1: Double): Seq[(Long, Double)] = {
    val known = rows.filter(r => w.contains(r._2))
    val flen = known.groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._4.toLong).sum).toMap
    val avg = w.keys.map { f =>
      val ls = flen.collect { case ((_, `f`), l) => l }.toSeq
      f -> ls.sum.toDouble / ls.size
    }.toMap
    val n = known.map(_._1).distinct.size
    val terms = query.map(_.toLowerCase).distinct
    val docs = known.map(_._1).distinct
    docs.flatMap { d =>
      val score = terms.map { t =>
        val wtf = known.filter(r => r._1 == d && r._3 == t).map { r =>
          w(r._2)._1 * r._4 / (1.0 + w(r._2)._2 * (flen((d, r._2)) / avg(r._2) - 1.0))
        }.sum
        if (wtf == 0.0) 0.0
        else {
          val df = known.filter(r => r._3 == t).map(_._1).distinct.size
          math.log((n - df + 0.5) / (df + 0.5) + 1.0) * wtf / (wtf + k1)
        }
      }.sum
      if (score > 0.0) Some(d -> math.rint(score * 1e6) / 1e6) else None
    }.sortBy { case (d, s) => (-s, d) }
  }

  private def run(query: Seq[String], w: Map[String, (Double, Double)],
                  k1: Double = 1.2, k: Int = 10): Seq[(Long, Double)] = {
    import spark.implicits._
    Bm25f.topK(rows.toDF("doc_id", "field", "term", "tf"), query, w, k1, k)
      .as[(Long, Double)].collect().toSeq
  }

  test("matches the literal BM25F formulas, both fields weighted") {
    val w = Map("head" -> (2.0, 0.5), "body" -> (1.0, 0.75))
    assert(run(Seq("scan", "filter"), w) == brute(Seq("scan", "filter"), w, 1.2))
  }

  test("single body field with w=1 reduces to plain BM25 over that field") {
    val w = Map("body" -> (1.0, 0.75))
    assert(run(Seq("scan", "row"), w) == brute(Seq("scan", "row"), w, 1.2))
  }

  test("boosting the head field promotes the head match") {
    // doc 3 matches 'filter' only in head; doc 2 only in body
    val even = run(Seq("filter"), Map("head" -> (1.0, 0.5), "body" -> (1.0, 0.75)))
    val boosted = run(Seq("filter"), Map("head" -> (8.0, 0.5), "body" -> (1.0, 0.75)))
    assert(boosted.head._1 == 3L)
    assert(boosted.find(_._1 == 3L).get._2 > even.find(_._1 == 3L).get._2)
  }

  test("bad inputs are loud") {
    intercept[IllegalArgumentException](run(Seq.empty, Map("body" -> (1.0, 0.75))))
    intercept[IllegalArgumentException](
      run(Seq("x"), Map.empty[String, (Double, Double)]))
    intercept[IllegalArgumentException](run(Seq("x"), Map("body" -> (1.0, 0.75)), k = 0))
  }
}
