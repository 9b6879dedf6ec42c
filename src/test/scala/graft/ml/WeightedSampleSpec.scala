package graft.ml

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** A-ES weighted sampling: determinism, weight bias, and edge handling. */
class WeightedSampleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("weighted-sample-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("deterministic across partitionings; exactly k rows; w<=0 excluded") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toLong, if (i % 100 == 0) 0L else i.toLong))
      .toDF("id", "w")
    val a = WeightedSample.topK(df, "id", "w", 40, "s1")
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    val b = WeightedSample.topK(df.repartition(13), "id", "w", 40, "s1")
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(a.sameElements(b))
    assert(a.length == 40)
    assert(a.forall(_._1 % 100 != 0), "zero-weight rows must never be drawn")
    assert(a.map(_._2).toSeq == a.map(_._2).sortBy(-_).toSeq,
      "rows must come back key-desc")
  }

  test("heavier rows are drawn more often across seeds") {
    import spark.implicits._
    // 200 light rows (w=1) + 200 heavy rows (w=20): heavy rows should
    // dominate a 50-row sample on any seed
    val df = ((1 to 200).map(i => (i.toLong, 1L)) ++
      (201 to 400).map(i => (i.toLong, 20L))).toDF("id", "w")
    val heavyCounts = Seq("a", "b", "c").map { seed =>
      WeightedSample.topK(df, "id", "w", 50, seed)
        .collect().count(_.getLong(0) > 200)
    }
    assert(heavyCounts.forall(_ >= 40),
      s"heavy rows under-drawn: $heavyCounts of 50 across seeds")
  }

  test("seed changes the sample") {
    import spark.implicits._
    val df = (1 to 300).map(i => (i.toLong, 5L)).toDF("id", "w")
    val s1 = WeightedSample.topK(df, "id", "w", 30, "x").collect()
      .map(_.getLong(0)).toSet
    val s2 = WeightedSample.topK(df, "id", "w", 30, "y").collect()
      .map(_.getLong(0)).toSet
    assert(s1 != s2)
  }
}
