package graft.query

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class InterleaveSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("interleave-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(rows: Seq[(Int, String, String, Int)], k: Int) = {
    import spark.implicits._
    Interleave.teamDraft(rows.toDF("query_id", "system", "url", "rank"),
        "A", "B", k)
      .as[(Int, Int, String, String)].collect().toSeq.sortBy(r => (r._1, r._2))
  }

  private def lists(q: Int, sys: String, urls: Seq[String]) =
    urls.zipWithIndex.map { case (u, i) => (q, sys, u, i + 1) }

  test("matches a literal draft with the deterministic coin") {
    val rows = lists(7, "A", Seq("a1", "x", "a3")) ++
      lists(7, "B", Seq("b1", "x", "b3"))
    val got = run(rows, 10)
    // literal replay
    def coin(r: Int) = graft.ml.PortableHash.h60(s"7|$r") % 2 == 0
    val expected = {
      val a = Seq("a1", "x", "a3"); val b = Seq("b1", "x", "b3")
      var (na, nb) = (0, 0)
      var picked = Set.empty[String]
      var out = Vector.empty[(String, String)]
      var done = false
      while (!done) {
        val nxa = a.find(!picked(_)); val nxb = b.find(!picked(_))
        if (nxa.isEmpty && nxb.isEmpty) done = true
        else {
          val aD = if (nxa.isEmpty) false else if (nxb.isEmpty) true
            else if (na != nb) na < nb else coin(na)
          val u = if (aD) nxa.get else nxb.get
          if (aD) na += 1 else nb += 1
          picked += u; out :+= ((u, if (aD) "A" else "B"))
        }
      }
      out.zipWithIndex.map { case ((u, t), i) => (7, i + 1, u, t) }
    }
    assert(got == expected)
    // the shared url "x" appears exactly once
    assert(got.count(_._3 == "x") == 1)
    // pick counts stay balanced within one
    val byTeam = got.groupBy(_._4).view.mapValues(_.size).toMap
    assert(math.abs(byTeam.getOrElse("A", 0) - byTeam.getOrElse("B", 0)) <= 1)
  }

  test("input order does not matter") {
    val rows = lists(3, "A", Seq("p", "q", "r", "s")) ++
      lists(3, "B", Seq("s", "r", "z", "p"))
    assert(run(rows, 6) == run(scala.util.Random.shuffle(rows.toList), 6))
  }

  test("an exhausted team cedes its turns; k caps the list") {
    val rows = lists(1, "A", Seq("a1")) ++
      lists(1, "B", Seq("b1", "b2", "b3", "b4"))
    val got = run(rows, 10)
    assert(got.map(_._3).toSet == Set("a1", "b1", "b2", "b3", "b4"))
    assert(got.count(_._4 == "A") == 1 && got.count(_._4 == "B") == 4)
    assert(run(rows, 3).size == 3)
  }

  test("bad args are loud") {
    import spark.implicits._
    val df = lists(1, "A", Seq("u")).toDF("query_id", "system", "url", "rank")
    intercept[IllegalArgumentException](Interleave.teamDraft(df, "A", "B", 0))
    intercept[IllegalArgumentException](Interleave.teamDraft(df, "A", "A", 5))
  }
}
