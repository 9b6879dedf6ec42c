package graft.query

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class LmRetrievalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("lm-retrieval-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // d1 matches both terms, d2 one term but short, d3 one term in a long
  // doc, d4 matches nothing (never a candidate)
  private val triples = Seq(
    ("d1", "galaxy", 3L), ("d1", "engine", 2L), ("d1", "misc", 5L),
    ("d2", "galaxy", 1L),
    ("d3", "engine", 1L), ("d3", "misc", 40L),
    ("d4", "misc", 7L))

  private def literal(terms: Seq[(String, Int)], mu: Double) = {
    val total = triples.map(_._3).sum.toDouble
    val cf = triples.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val live = terms.filter(t => cf.contains(t._1))
    val dl = triples.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val tf = triples.map(t => (t._1, t._2) -> t._3).toMap
    val cand = triples.collect {
      case (u, t, _) if live.exists(_._1 == t) => u
    }.distinct
    cand.map { u =>
      val s = live.map { case (t, m) =>
        m.toDouble * math.log(
          (tf.getOrElse((u, t), 0L).toDouble + mu * cf(t).toDouble / total) /
            (dl(u).toDouble + mu))
      }.sum
      (u, s)
    }.sortBy { case (u, s) => (-s, u) }
  }

  private def run(terms: Seq[(String, Int)], mu: Double, k: Int) = {
    import spark.implicits._
    LmRetrieval.dirichletTopK(spark, triples.toDF("url", "term", "tf"),
        terms, mu, k)
      .as[(Int, String, Double)].collect().toSeq
  }

  test("matches the literal Dirichlet QL computation") {
    val terms = Seq(("engine", 1), ("galaxy", 2))
    val got = run(terms, 2000.0, 10)
    val want = literal(terms, 2000.0).zipWithIndex.map { case ((u, s), i) =>
      (i + 1, u, math.rint(s * 1e6) / 1e6)
    }
    assert(got == want)
    // d4 matches no term → never a candidate
    assert(!got.exists(_._2 == "d4"))
  }

  test("background mass: a doc missing a query term still scores all terms") {
    // single-term doc d2 must carry engine's background probability —
    // its score must differ from a galaxy-only scorer's by a nonzero
    // engine contribution
    val both = run(Seq(("galaxy", 1), ("engine", 1)), 2000.0, 10)
    val galaxyOnly = run(Seq(("galaxy", 1)), 2000.0, 10)
    val d2Both = both.find(_._2 == "d2").get._3
    val d2G = galaxyOnly.find(_._2 == "d2").get._3
    assert(d2Both < d2G) // ln of a probability < 0: adding a term lowers it
  }

  test("zero-cf query terms are dropped, not -inf") {
    val got = run(Seq(("galaxy", 1), ("zzznothere", 4)), 2000.0, 10)
    val want = run(Seq(("galaxy", 1)), 2000.0, 10)
    assert(got == want)
    assert(got.forall(r => !r._3.isNaN && !r._3.isInfinite))
  }

  test("length normalization: same tf, longer doc scores lower") {
    // d3 (dl=41) vs a matching-tf d2 (dl=1) on their own matched terms:
    // construct directly — one term, tf=1 each, different dl
    val got = run(Seq(("engine", 1)), 2000.0, 10)
    val d1 = got.find(_._2 == "d1").get._3 // tf=2, dl=10
    val d3 = got.find(_._2 == "d3").get._3 // tf=1, dl=41
    assert(d1 > d3)
  }

  test("queryTerms pins multiplicity and order") {
    val ts = LmRetrieval.queryTerms("running running galaxy")
    assert(ts == Seq(("galaxy", 1), ("running", 2)))
    intercept[IllegalArgumentException](run(Seq.empty, 2000.0, 5))
    intercept[IllegalArgumentException](run(Seq(("a", 1)), 0.0, 5))
  }
}
