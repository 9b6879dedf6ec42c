package graft.query

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class RocchioSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("rocchio-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // d1/d2 match "galaxy" and share "nebula"; d3 has only "nebula";
  // d4 is unrelated filler so idf varies
  private val triples = Seq(
    ("d1", "galaxy", 4L), ("d1", "nebula", 2L), ("d1", "misc", 1L),
    ("d2", "galaxy", 2L), ("d2", "nebula", 3L),
    ("d3", "nebula", 1L), ("d3", "misc", 6L),
    ("d4", "misc", 5L), ("d4", "other", 2L))

  private val K1 = 1.2
  private val B = 0.75

  private def bm25(tf: Long, df: Long, dl: Long, nd: Double, avgdl: Double) =
    math.log((nd - df + 0.5) / (df + 0.5) + 1.0) *
      (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * dl / avgdl))

  /** Literal two-phase Rocchio over the fixture. */
  private def literal(terms: Seq[(String, Int)], beta: Double,
                      nF: Int, nE: Int, k: Int) = {
    val dl = triples.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val df = triples.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nd = dl.size.toDouble
    val avgdl = dl.values.sum.toDouble / nd
    def score(ws: Seq[(String, Double)], n: Int) =
      triples.flatMap { case (u, t, tf) =>
        ws.find(_._1 == t).map { case (_, w) =>
          (u, w * bm25(tf, df(t), dl(u), nd, avgdl))
        }
      }.groupBy(_._1).view
        .mapValues(cs => math.rint(cs.map(_._2).sum * 1e6) / 1e6).toSeq
        .sortBy { case (u, s) => (-s, u) }.take(n)
    val fb = score(terms.map(t => (t._1, t._2.toDouble)), nF).map(_._1)
    val pool = triples.filter(t => fb.contains(t._1))
      .filterNot(t => terms.exists(_._1 == t._2))
      .groupBy(_._2).view.mapValues(_.map(_._3).sum).toSeq
    val exp = pool.map { case (t, stf) =>
      (t, beta * math.log((nd - df(t) + 0.5) / (df(t) + 0.5) + 1.0) * stf / nF)
    }.sortBy { case (t, w) => (-w, t) }.take(nE)
    val fw = terms.map(t => (t._1, t._2.toDouble)) ++ exp
    (score(fw, k), exp)
  }

  private def run(terms: Seq[(String, Int)], beta: Double,
                  nF: Int, nE: Int, k: Int) = {
    import spark.implicits._
    val (out, exp) = Rocchio.prfTopK(spark,
      triples.toDF("url", "term", "tf"), terms, 1.0, beta, nF, nE, k)
    (out.as[(Int, String, Double)].collect().toSeq, exp)
  }

  test("matches the literal two-phase PRF computation") {
    val terms = Seq(("galaxy", 1))
    val (got, gotExp) = run(terms, 0.75, 2, 2, 4)
    val (want, wantExp) = literal(terms, 0.75, 2, 2, 4)
    assert(got == want.zipWithIndex.map { case ((u, s), i) => (i + 1, u, s) })
    assert(gotExp.map(_._1) == wantExp.map(_._1))
    gotExp.zip(wantExp).foreach { case ((_, gw), (_, ww)) =>
      assert(math.abs(gw - math.rint(ww * 1e6) / 1e6) < 1e-9)
    }
    // feedback docs d1/d2 share "nebula" → it must be the top expansion
    assert(gotExp.head._1 == "nebula")
    // expansion never re-proposes an original term
    assert(!gotExp.exists(_._1 == "galaxy"))
  }

  test("expansion surfaces docs the original query missed") {
    // d3 has no "galaxy" — PRF pulls it in via "nebula"
    val (got, _) = run(Seq(("galaxy", 1)), 0.75, 2, 2, 4)
    assert(got.exists(_._2 == "d3"))
  }

  test("nExpand=0 degrades to plain weighted BM25") {
    val (got, exp) = run(Seq(("galaxy", 1)), 0.75, 2, 0, 4)
    assert(exp.isEmpty)
    assert(got.map(_._2).toSet == Set("d1", "d2")) // only matching docs
  }

  test("bad args are loud") {
    import spark.implicits._
    val df = triples.toDF("url", "term", "tf")
    intercept[IllegalArgumentException](
      Rocchio.prfTopK(spark, df, Seq.empty, 1.0, 0.75, 2, 2, 4))
    intercept[IllegalArgumentException](
      Rocchio.prfTopK(spark, df, Seq(("a", 1)), 1.0, 0.75, 0, 2, 4))
  }
}
