package graft.rank

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TrustRankSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("trustrank-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Trusted hub s0 -> g1 -> g2 (good chain), plus a 3-node spam farm
    * f0 <-> f1 <-> f2 with no path from the trusted side. */
  private def graph() = {
    import spark.implicits._
    val nodes = Seq("s0", "g1", "g2", "f0", "f1", "f2").toDF("url")
    val edges = Seq(
      ("s0", "g1"), ("g1", "g2"), ("g2", "s0"),
      ("f0", "f1"), ("f1", "f0"), ("f1", "f2"), ("f2", "f1"))
      .toDF("src", "dst")
    (nodes, edges)
  }

  test("farm pages get spam mass 1, trusted neighborhood gets <= 0") {
    import spark.implicits._
    val (nodes, edges) = graph()
    val trusted = Seq("s0").toDF("url")
    val got = TrustRank.spamMass(spark, nodes, edges, trusted, iters = 12)
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // unreachable from the seed: trust is exactly 0, mass exactly 1
    for (f <- Seq("f0", "f1", "f2")) {
      assert(got(f)._3 == 0.0, s"$f trust")
      assert(got(f)._4 == 1.0, s"$f mass")
      assert(got(f)._2 > 0.0, s"$f pr") // still has uniform-teleport rank
    }
    // the seed and its chain carry MORE trust than uniform importance
    for (g <- Seq("s0", "g1", "g2")) assert(got(g)._4 <= 0.0, s"$g mass: ${got(g)}")
  }

  test("trust column IS Personalized.run on the trusted seeds") {
    import spark.implicits._
    val (nodes, edges) = graph()
    val trusted = Seq("s0", "g2").toDF("url")
    val viaTrustRank = TrustRank.spamMass(spark, nodes, edges, trusted, 8)
      .select(col("url"), col("trust")).as[(String, Double)].collect().toMap
    val direct = Personalized.run(spark, nodes, edges, trusted, 8)
      .as[(String, Double)].collect().toMap
    assert(viaTrustRank == direct)
  }

  test("both walks conserve total mass") {
    import spark.implicits._
    val (nodes, edges) = graph()
    // a cyclic graph with no dangling nodes conserves mass exactly
    val got = TrustRank.spamMass(spark, nodes, edges, Seq("s0").toDF("url"), 10)
      .agg(sum("pr"), sum("trust")).as[(Double, Double)].head()
    assert(math.abs(got._1 - 1.0) < 1e-9)
    assert(math.abs(got._2 - 1.0) < 1e-9)
  }
}
