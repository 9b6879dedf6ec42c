package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class FunnelRetentionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("funnel-retention-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("funnel: strictly-after sequencing, no double counting") {
    // u1 completes in order; u2 clicks BEFORE viewing (click must not
    // count); u3 views only; u4 does click/purchase without a view (never
    // enters the funnel)
    val ev = Seq(
      (1L, ts(100), "view"), (1L, ts(200), "click"), (1L, ts(300), "purchase"),
      (1L, ts(150), "click"), // earlier click also valid (after view)
      (2L, ts(100), "click"), (2L, ts(200), "view"), (2L, ts(50), "purchase"),
      (3L, ts(100), "view"),
      (4L, ts(100), "click"), (4L, ts(200), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .as[(Int, String, Long, Option[Double])].collect().toSeq
    assert(got == Seq(
      (1, "view", 3L, Some(1.0)),        // u1, u2, u3
      (2, "click", 1L, Some(math.rint(1.0 / 3.0 * 1e6) / 1e6)), // only u1
      (3, "purchase", 1L, Some(math.rint(1.0 / 3.0 * 1e6) / 1e6))))
  }

  test("funnel: stage-k reach time is the MIN qualifying event") {
    // u1 clicks at 150 and 200 after viewing at 100; purchase at 180 —
    // after the EARLIEST click (150), so it counts
    val ev = Seq(
      (1L, ts(100), "view"), (1L, ts(150), "click"), (1L, ts(200), "click"),
      (1L, ts(180), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .as[(Int, String, Long, Option[Double])].collect().toSeq
    assert(got.map(r => (r._2, r._3)) ==
      Seq(("view", 1L), ("click", 1L), ("purchase", 1L)))
  }

  test("funnel: bad args are loud") {
    val ev = Seq((1L, ts(1), "view")).toDF("user_id", "ts", "event_type")
    intercept[IllegalArgumentException](
      Funnel.funnel(ev, "user_id", "ts", "event_type", Seq("view")))
    intercept[IllegalArgumentException](
      Funnel.funnel(ev, "user_id", "ts", "event_type", Seq("a", "a")))
  }

  test("retention: cohorts by first epoch-week, fractions per cell") {
    val wk = 604800L
    // u1 first week 0, active weeks 0,1,3; u2 first week 0, active 0;
    // u3 first week 1, active 1,2
    val ev = Seq(
      (1L, ts(10)), (1L, ts(wk + 5)), (1L, ts(3 * wk + 1)), (1L, ts(20)),
      (2L, ts(30)),
      (3L, ts(wk + 10)), (3L, ts(2 * wk + 10))
    ).toDF("user_id", "ts")
    val got = Retention.weekly(ev, "user_id", "ts")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (0L, 0L, 2L, 1.0), (0L, 1L, 1L, 0.5), (0L, 3L, 1L, 0.5),
      (1L, 0L, 1L, 1.0), (1L, 1L, 1L, 1.0)))
  }
}
