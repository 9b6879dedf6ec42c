package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketization must change the plan, never the rows: the result is the
  * naive inequality join, each match exactly once, under ANY width. */
class RangeJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("range-join-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fixtures = {
    import spark.implicits._
    // deterministic scatter incl. exact boundary hits
    val points = (0 until 400)
      .map(i => (i.toLong, (i * 37 % 1000).toDouble)).toDF("pid", "p")
    val intervals = (0 until 30)
      .map(i => (i.toLong, (i * 61 % 900).toDouble,
        (i * 61 % 900 + 25 + 10 * (i % 4)).toDouble))
      .toDF("iid", "s", "e")
    (points, intervals)
  }

  private def naive = {
    val (points, intervals) = fixtures
    points.crossJoin(intervals)
      .filter(col("p") >= col("s") && col("p") <= col("e"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
  }

  test("equals the naive inequality join at several bucket widths") {
    val (points, intervals) = fixtures
    val expect = naive
    assert(expect.nonEmpty)
    for (w <- Seq(7.0, 25.0, 64.0, 1000.0)) {
      val got = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", w)
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == expect, s"width $w diverged")
    }
  }

  test("each match exactly once (no dedup pass hides a double-emit)") {
    val (points, intervals) = fixtures
    val got = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", 10.0)
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.distinct.size == got.size)
  }

  test("boundaries are inclusive on both ends") {
    import spark.implicits._
    val pts = Seq((1L, 10.0), (2L, 20.0), (3L, 9.999), (4L, 20.001))
      .toDF("pid", "p")
    val iv = Seq((1L, 10.0, 20.0)).toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(pts, "p", iv, "s", "e", 5.0)
      .select("pid").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L))
  }

  test("plans as an equi-join on the bucket, not a nested loop") {
    val (points, intervals) = fixtures
    val df = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", 25.0)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"bucketization must keep this an equi-join:\n$plan")
    assert(plan.contains("_bucket"), s"bucket key must drive the join:\n$plan")
  }
}
