package graft.query

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class TrendingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("trending-spec")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val H0 = 1700000000L / 3600L * 3600L // aligned epoch hour

  private def rows(q: String, hour: Int, n: Int): Seq[(String, Timestamp)] =
    (0 until n).map(i =>
      (q, new Timestamp((H0 + hour * 3600L + i % 3600) * 1000L)))

  private def run(log: Seq[(String, Timestamp)], w: Int, f: Int, m: Long) = {
    import spark.implicits._
    Trending.bursts(log.toDF("query", "ts"), w, f, m)
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
      .map { case (q, h, c, p, b) => (q, h - H0 / 3600L, c, p, b) }
      .sortBy(r => (r._1, r._2))
  }

  test("steady traffic never bursts; a spike over factor x baseline does") {
    // 2/hour for 6 hours, then 9 in hour 6: baseline sum 12 over w=6,
    // 9*6=54 > 3*12=36 -> burst. Hour 7 back to 2: 2*6=12 < 3*19 -> calm.
    val log = (0 until 6).flatMap(h => rows("q", h, 2)) ++
      rows("q", 6, 9) ++ rows("q", 7, 2)
    val got = run(log, w = 6, f = 3, m = 5)
    assert(got.map(r => (r._2, r._3, r._5)) == Seq(
      (0L, 2L, false), (1L, 2L, false), (2L, 2L, false), (3L, 2L, false),
      (4L, 2L, false), (5L, 2L, false), (6L, 9L, true), (7L, 2L, false)))
    // prev_sum at hour 6 covers hours 0..5 (2*6); at hour 7 hours 1..6
    assert(got.find(_._2 == 6L).get._4 == 12L)
    assert(got.find(_._2 == 7L).get._4 == 19L)
  }

  test("first active hour bursts only over the absolute floor") {
    val got = run(rows("new", 0, 5) ++ rows("tiny", 0, 4), 6, 3, 5)
    assert(got == Seq(("new", 0L, 5L, 0L, true), ("tiny", 0L, 4L, 0L, false)))
  }

  test("silent hours dilute the baseline (range window, not rows)") {
    // 6 events in hour 0, then silence until hour 10: the trailing 6-hour
    // window at hour 10 is EMPTY -> prev_sum 0 -> burst. A rows-based
    // window would still see hour 0 and block it.
    val got = run(rows("q", 0, 6) ++ rows("q", 10, 6), 6, 3, 5)
    assert(got.map(r => (r._2, r._4, r._5)) == Seq((0L, 0L, true), (10L, 0L, true)))
  }

  test("bad args are loud") {
    import spark.implicits._
    val df = rows("q", 0, 1).toDF("query", "ts")
    intercept[IllegalArgumentException](Trending.bursts(df, 0, 3, 5))
    intercept[IllegalArgumentException](Trending.bursts(df, 6, 0, 5))
    intercept[IllegalArgumentException](Trending.bursts(df, 6, 3, 0))
  }
}
