package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** As-of join tie/edge semantics and exact-quantile agreement with Spark's
  * own percentile_cont implementation, plus partitioning invariance for
  * both (the window/union plans must not leak physical row order). */
class OperatorsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("operators-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("asOf: inclusive ts, max-tieBreak on right ties, null when no match") {
    import spark.implicits._
    val left = Seq(
      (100L, 1L, ts(50), 5.0),  // between right rows
      (101L, 1L, ts(10), 6.0),  // exactly at a right row's ts (inclusive)
      (102L, 1L, ts(5), 7.0),   // before every right row -> nulls
      (103L, 2L, ts(99), 8.0)   // key with no right rows at all -> nulls
    ).toDF("event_id", "user_id", "ts", "value")
    val right = Seq(
      (1L, ts(10), 200L, 1.0),
      (1L, ts(10), 201L, 2.0),  // same ts as 200 -> larger event_id wins
      (1L, ts(40), 202L, 3.0)
    ).toDF("user_id", "ts", "event_id", "value")

    val out = AsOfJoin.asOf(left, right, "user_id", "ts", "ts", "event_id")
      .select("event_id", "asof_event_id", "asof_value")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2))).toSet
    assert(out == Set(
      (100L, 202L, 3.0),   // latest ts <= 50 is ts=40
      (101L, 201L, 2.0),   // inclusive match at equal ts, max event_id
      (102L, -1L, -1.0),
      (103L, -1L, -1.0)))
  }

  test("asOf: a NULL right timestamp never matches; NULL left ts gets nulls") {
    import spark.implicits._
    val left = Seq((1L, 1L, Some(ts(50)), 1.0), (2L, 1L, None, 2.0))
      .toDF("event_id", "user_id", "ts", "value")
    val right = Seq((1L, None: Option[Timestamp], 900L, 9.0))
      .toDF("user_id", "ts", "event_id", "value")
    val out = AsOfJoin.asOf(left, right, "user_id", "ts", "ts", "event_id")
      .collect().map(r => (r.getLong(0), r.isNullAt(4))).toSet
    assert(out == Set((1L, true), (2L, true)),
      "null-ts rows must not participate on either side")
  }

  test("asOf: result invariant under input partitioning") {
    import spark.implicits._
    val left = (1 to 400).map(i =>
      (i.toLong, (i % 7).toLong, ts(i * 3L), i * 1.0))
      .toDF("event_id", "user_id", "ts", "value")
    val right = (1 to 300).map(i =>
      ((i % 7).toLong, ts(i * 4L), 1000L + i, i * 2.0))
      .toDF("user_id", "ts", "event_id", "value")
    val a = AsOfJoin.asOf(left, right, "user_id", "ts", "ts", "event_id")
      .collect().map(_.toString).sorted
    val b = AsOfJoin.asOf(left.repartition(13), right.repartition(3),
      "user_id", "ts", "ts", "event_id")
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("quantiles: exact values match Spark's percentile, p=0/1 are min/max") {
    import spark.implicits._
    // Values with duplicates and non-uniform gaps; two groups of different
    // sizes (17 and 40) so interpolation positions are fractional.
    val df = ((1 to 17).map(i => ("a", (i * i % 13) * 1.5)) ++
      (1 to 40).map(i => ("b", (i * 7 % 23) * 0.25)))
      .toDF("g", "v")
    val ps = Seq(0.0, 0.1, 0.5, 0.77, 1.0)
    val got = Quantiles.exact(df, "g", "v", ps)
      .collect().map(r => ((r.getString(0), r.getDouble(1)), r.getDouble(2)))
      .toMap
    val want = df.groupBy("g")
      .agg(expr(s"percentile(v, array(${ps.mkString(",")}))").as("qs"),
        min("v").as("lo"), max("v").as("hi"))
      .collect().flatMap { r =>
        val qs = r.getSeq[Double](1)
        assert(qs.head == r.getDouble(2) && qs.last == r.getDouble(3))
        ps.zip(qs).map { case (p, q) => ((r.getString(0), p), q) }
      }.toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - want(k)) < 1e-9, s"$k: $v vs ${want(k)}") }
  }

  test("exactGlobal agrees with grouped exact on a constant group") {
    import spark.implicits._
    val vals = (1 to 1000).map(i => ((i * 13 % 97) * 0.75))
    val df = vals.map(v => ("all", v)).toDF("g", "v")
    val ps = Seq(0.0, 0.33, 0.5, 0.99, 1.0)
    val grouped = Quantiles.exact(df, "g", "v", ps)
      .collect().map(r => (r.getDouble(1), r.getDouble(2))).toMap
    val global = Quantiles.exactGlobal(df.repartition(7), "v", ps)
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toMap
    assert(grouped.keySet == global.keySet)
    grouped.foreach { case (p, q) =>
      assert(q == global(p), s"p=$p: grouped $q vs global ${global(p)}") }
  }

  test("quantiles ignore NULL values like percentile_cont") {
    import spark.implicits._
    val d = Seq(("a", Some(1.0)), ("a", None), ("a", Some(2.0)))
      .toDF("g", "v")
    val got = Quantiles.exact(d, "g", "v", Seq(0.0, 0.5, 1.0))
      .collect().map(r => (r.getDouble(1), r.getDouble(2))).toMap
    assert(got == Map(0.0 -> 1.0, 0.5 -> 1.5, 1.0 -> 2.0),
      s"nulls must be excluded from ranks and counts: $got")
    val global = Quantiles.exactGlobal(d, "v", Seq(0.5))
      .collect().map(r => r.getDouble(1))
    assert(global.toSeq == Seq(1.5))
  }

  test("quantiles: invariant under partitioning; single-row group works") {
    import spark.implicits._
    val df = ((1 to 100).map(i => ("x", i * 0.5)) ++ Seq(("solo", 42.0)))
      .toDF("g", "v")
    val ps = Seq(0.0, 0.25, 0.9, 1.0)
    val a = Quantiles.exact(df, "g", "v", ps)
      .collect().map(_.toString).sorted
    val b = Quantiles.exact(df.repartition(17), "g", "v", ps)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
    val solo = Quantiles.exact(df, "g", "v", ps)
      .filter(col("g") === "solo").collect()
    assert(solo.length == 4 && solo.forall(_.getDouble(2) == 42.0))
  }
}
