package graft.query

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class DiversifySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("diversify-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def base = {
    import spark.implicits._
    Seq(
      (1, "http://a.example/1", 9.0),
      (2, "http://a.example/2", 8.0),
      (3, "http://a.example/3", 7.0),
      (4, "http://b.example:443/1", 6.0),
      (5, "http://b.example:443/2", 5.0),
      (6, "http://c.example/1", 4.0)).toDF("rank", "url", "score")
  }

  test("keeps at most perHost per host in rank order and re-ranks") {
    val got = Diversify.hostCollapse(base, perHost = 2, k = 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq(
      (1, "http://a.example/1", "a.example"),
      (2, "http://a.example/2", "a.example"),
      (3, "http://b.example:443/1", "b.example:443"),
      (4, "http://b.example:443/2", "b.example:443")))
  }

  test("perHost=1 keeps one per host; k truncates") {
    val got = Diversify.hostCollapse(base, perHost = 1, k = 2).collect()
      .map(r => (r.getInt(0), r.getString(1)))
    assert(got.toSeq == Seq(
      (1, "http://a.example/1"), (2, "http://b.example:443/1")))
  }

  test("scores ride along and perHost >= 1 is enforced") {
    val got = Diversify.hostCollapse(base, perHost = 3, k = 100).collect()
    assert(got.map(_.getDouble(3)).toSeq == Seq(9.0, 8.0, 7.0, 6.0, 5.0, 4.0))
    intercept[IllegalArgumentException] {
      Diversify.hostCollapse(base, perHost = 0, k = 10)
    }
  }
}
