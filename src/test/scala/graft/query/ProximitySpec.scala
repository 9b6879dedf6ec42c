package graft.query

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ProximitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("proximity-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(docs: Seq[(Long, String)], a: String, b: String, k: Int) = {
    import spark.implicits._
    val pos = PhraseSearch.positions(docs.toDF("doc_id", "text"), "doc_id", "text")
    Proximity.topK(pos, a, b, k).as[(Long, Int)].collect().toSeq
  }

  test("literal distances, ranking, and both-terms requirement") {
    val docs = Seq(
      (1L, "scan the filter"),            // dist 2
      (2L, "scan filter"),                // dist 1 — best
      (3L, "filter x y z scan filter"),   // closest pair: scan(4)-filter(5) = 1
      (4L, "scan only here"),             // missing 'filter' — no row
      (5L, "filter alone"))               // missing 'scan' — no row
    assert(run(docs, "scan", "filter", 10) ==
      Seq((2L, 1), (3L, 1), (1L, 2)))
  }

  test("matches the brute-force pairwise minimum on random docs") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e")
    val docs = (0L until 40L).map { i =>
      i -> Seq.fill(3 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val expected = docs.flatMap { case (id, text) =>
      val toks = text.split(" ")
      val pa = toks.zipWithIndex.collect { case ("a", p) => p }
      val pb = toks.zipWithIndex.collect { case ("b", p) => p }
      if (pa.isEmpty || pb.isEmpty) None
      else Some(id -> (for (x <- pa; y <- pb) yield math.abs(x - y)).min)
    }.sortBy { case (id, d) => (d, id) }.take(15)
    assert(run(docs, "a", "b", 15) == expected)
  }

  test("identical terms and bad k are loud") {
    intercept[IllegalArgumentException](run(Seq((1L, "x")), "Same", "same", 5))
    intercept[IllegalArgumentException](run(Seq((1L, "x")), "a", "b", 0))
  }
}
