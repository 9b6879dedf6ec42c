package graft.crawl

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The allocation must sum to the budget exactly, stay within the quota
  * rule (floor or floor+1 of the exact share), break remainder ties
  * deterministically, and survive a zero-work frontier. */
class ApportionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("apportion-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("sums to budget, quota rule, deterministic ties") {
    import spark.implicits._
    val counts = Seq(("a", 5L), ("b", 5L), ("c", 5L), ("d", 3L), ("e", 2L))
      .toDF("host", "n")
    val got = Apportion.largestRemainder(counts, "host", "n", budget = 7)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.values.map(_._3).sum == 7L)
    // exact shares: 1.75, 1.75, 1.75, 1.05, 0.7 → bases 1,1,1,1,0 = 4,
    // 3 extras to the largest remainders .75,.75,.75 (hosts a,b,c by tie)
    assert(got == Map(
      "a" -> (1L, 1L, 2L), "b" -> (1L, 1L, 2L), "c" -> (1L, 1L, 2L),
      "d" -> (1L, 0L, 1L), "e" -> (0L, 0L, 0L)))
  }

  test("zero total work allocates nothing without dividing by zero") {
    import spark.implicits._
    val got = Apportion.largestRemainder(
      Seq(("a", 0L), ("b", 0L)).toDF("host", "n"), "host", "n", 100)
      .collect().map(_.getLong(4)).sum
    assert(got == 0L)
  }

  test("large random-ish counts: budget exact, every host floor or floor+1") {
    import spark.implicits._
    val counts = (1 to 200).map(i => (s"h$i", ((i * 7919L) % 1000L)))
      .toDF("host", "n")
    val budget = 12345L
    val rows = Apportion.largestRemainder(counts, "host", "n", budget).collect()
    assert(rows.map(_.getLong(4)).sum == budget)
    assert(rows.forall(r => r.getLong(4) == r.getLong(2) ||
      r.getLong(4) == r.getLong(2) + 1L))
  }
}
