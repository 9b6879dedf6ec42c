package graft.query

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ClaritySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("clarity-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // "galaxy" lives in a tight topical cluster (d1,d2) with its own
  // vocabulary; "misc" appears in EVERY doc (collection-like)
  private val triples = Seq(
    ("d1", "galaxy", 4L), ("d1", "nebula", 3L), ("d1", "misc", 1L),
    ("d2", "galaxy", 2L), ("d2", "nebula", 2L), ("d2", "misc", 1L),
    ("d3", "misc", 3L), ("d3", "other", 2L),
    ("d4", "misc", 2L), ("d4", "other", 4L))

  private def literal(queries: Seq[(Int, Seq[(String, Int)])],
                      mu: Double, nF: Int) = {
    val total = triples.map(_._3).sum.toDouble
    val cfAll = triples.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val dl = triples.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val tf = triples.map(t => (t._1, t._2) -> t._3).toMap
    queries.map { case (qid, ts0) =>
      val ts = ts0.filter(t => cfAll.contains(t._1))
      val cand = triples.collect {
        case (u, t, _) if ts.exists(_._1 == t) => u
      }.distinct
      val fb = cand.map { u =>
        val s = ts.map { case (t, m) =>
          m * math.log(
            (tf.getOrElse((u, t), 0L).toDouble + mu * cfAll(t) / total) /
              (dl(u) + mu))
        }.sum
        (u, math.rint(s * 1e6) / 1e6)
      }.sortBy { case (u, s) => (-s, u) }.take(nF).map(_._1)
      val rtf = triples.filter(t => fb.contains(t._1))
        .groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
      val rlen = rtf.values.sum.toDouble
      val kl = rtf.map { case (t, c) =>
        val p = c / rlen
        p * math.log(p / (cfAll(t) / total))
      }.sum
      (qid, rtf.size.toLong, math.rint(kl * 1e6) / 1e6)
    }.sortBy(_._1)
  }

  private def run(queries: Seq[(Int, Seq[(String, Int)])], nF: Int) = {
    import spark.implicits._
    Clarity.batch(spark, triples.toDF("url", "term", "tf"),
        queries, 2000.0, nF)
      .as[(Int, Long, Double)].collect().toSeq
  }

  test("matches the literal clarity computation") {
    val qs = Seq((0, Seq(("galaxy", 1))), (1, Seq(("misc", 1))),
      (2, Seq(("galaxy", 1), ("zzznothere", 3))))
    assert(run(qs, 2) == literal(qs, 2000.0, 2))
  }

  test("topical query scores higher clarity than collection-like query") {
    // "misc" matches all 4 docs; with nFeedback = 4 its feedback set IS
    // the collection → P(w|R) = P(w|C) term by term → KL exactly 0
    val misc = run(Seq((0, Seq(("misc", 1)))), 4)
    assert(misc.head._3 == 0.0)
    val galaxy = run(Seq((0, Seq(("galaxy", 1)))), 2)
    assert(galaxy.head._3 > 0.0)
  }

  test("bad args are loud") {
    import spark.implicits._
    val df = triples.toDF("url", "term", "tf")
    intercept[IllegalArgumentException](Clarity.batch(spark, df, Seq.empty, 2000.0, 2))
    intercept[IllegalArgumentException](
      Clarity.batch(spark, df, Seq((0, Seq.empty)), 2000.0, 2))
    intercept[IllegalArgumentException](
      Clarity.batch(spark, df, Seq((0, Seq(("a", 1)))), 2000.0, 0))
  }
}
