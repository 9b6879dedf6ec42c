package graft.rank

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Frontier-filtered distributed PPR must equal an independent dense
  * power iteration (same algebra, driver arrays) to FP-noise tolerance. */
class PersonalizedSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("personalized-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // 12 nodes, formulaic edges incl. a cycle, a hub, a dangling TARGET
  // ("ghost" never appears as a node) and two unreachable nodes
  private val nodeIds = (0 until 12).map(i => s"n$i")
  private val edgeList: Seq[(String, String)] =
    (0 until 10).map(i => s"n$i" -> s"n${(i + 1) % 10}") ++
      Seq("n0" -> "n5", "n1" -> "n7", "n2" -> "ghost", "n3" -> "n0",
        "n5" -> "n2", "n7" -> "n4")
  private val seedIds = Seq("n0", "n3")

  private def dense(iters: Int, d: Double): Map[String, Double] = {
    val idx = nodeIds.zipWithIndex.toMap
    val outdeg = edgeList.groupBy(_._1).view.mapValues(_.size).toMap
    val live = edgeList.filter(e => idx.contains(e._2))
    val p = nodeIds.map(n => if (seedIds.contains(n)) 1.0 / seedIds.size else 0.0).toArray
    var r = p.clone()
    for (_ <- 1 to iters) {
      val next = new Array[Double](nodeIds.size)
      for (i <- nodeIds.indices) next(i) = (1.0 - d) * p(i)
      for ((s, t) <- live) next(idx(t)) += d * r(idx(s)) / outdeg(s)
      r = next
    }
    nodeIds.zip(r).toMap
  }

  test("equals the dense power iteration on every node") {
    import spark.implicits._
    val got = Personalized.run(spark,
      nodeIds.toDF("url"), edgeList.toDF("src", "dst"),
      seedIds.toDF("url"), iters = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = dense(8, 0.85)
    assert(got.keySet == nodeIds.toSet)
    for (n <- nodeIds)
      assert(math.abs(got(n) - want(n)) < 1e-12, s"$n: ${got(n)} vs ${want(n)}")
    // unreachable non-seeds stay exactly zero; seeds keep teleport mass
    assert(got("n10") == 0.0 && got("n11") == 0.0)
    assert(got("n0") > 0.15 / 2 && got("n3") > 0.15 / 2)
    // dangling-target mass leaks: total strictly below 1
    assert(got.values.sum < 1.0 && got.values.sum > 0.5)
  }

  test("duplicate seeds collapse; single seed concentrates mass") {
    import spark.implicits._
    val got = Personalized.run(spark,
      nodeIds.toDF("url"), edgeList.toDF("src", "dst"),
      Seq("n0", "n0").toDF("url"), iters = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("n0") == got.values.max)
  }
}
