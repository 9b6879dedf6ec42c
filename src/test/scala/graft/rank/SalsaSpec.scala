package graft.rank

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class SalsaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("salsa-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Literal single-threaded SALSA for any graph. */
  private def literal(nodes: Seq[String], edges: Seq[(String, String)],
                      iters: Int): Map[String, (Double, Double)] = {
    val live = edges.filter(e => nodes.contains(e._1) && nodes.contains(e._2))
    val outdeg = live.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val indeg = live.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    var h = nodes.map(_ -> 1.0).toMap
    var a = Map.empty[String, Double]
    for (_ <- 1 to iters) {
      a = nodes.map(v =>
        v -> live.filter(_._2 == v).map(e => h(e._1) / outdeg(e._1)).sum).toMap
      h = nodes.map(u =>
        u -> live.filter(_._1 == u).map(e => a(e._2) / indeg(e._2)).sum).toMap
    }
    nodes.map(v => v -> (h(v), a(v))).toMap
  }

  test("matches the literal power iteration and resists TKC capture") {
    import spark.implicits._
    // a 3-clique (mutually linked spam nest) vs a genuinely popular page
    // endorsed by 4 independent hubs
    val nodes = Seq("c1", "c2", "c3", "star", "h1", "h2", "h3", "h4")
    val edges = Seq(
      ("c1", "c2"), ("c2", "c1"), ("c1", "c3"), ("c3", "c1"),
      ("c2", "c3"), ("c3", "c2"),
      ("h1", "star"), ("h2", "star"), ("h3", "star"), ("h4", "star"))
    val got = Salsa.run(spark, nodes.toDF("url"),
        edges.toDF("src", "dst"), iters = 6)
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val want = literal(nodes, edges, 6)
    for (v <- nodes) {
      assert(math.abs(got(v)._1 - want(v)._1) < 1e-12, s"hub $v")
      assert(math.abs(got(v)._2 - want(v)._2) < 1e-12, s"auth $v")
    }
    // the independently endorsed page out-ranks every clique member —
    // under raw HITS the clique's mutual reinforcement wins instead
    val cliqueBest = Seq("c1", "c2", "c3").map(got(_)._2).max
    assert(got("star")._2 > cliqueBest)
  }

  test("edges outside the node frame are dropped; isolated nodes read 0") {
    import spark.implicits._
    val got = Salsa.run(spark, Seq("a", "b", "lone").toDF("url"),
        Seq(("a", "b"), ("a", "ghost"), ("ghost", "b")).toDF("src", "dst"), 3)
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got("lone") == (0.0, 0.0))
    assert(got == literal(Seq("a", "b", "lone"),
      Seq(("a", "b"), ("a", "ghost"), ("ghost", "b")), 3))
  }

  test("bad args are loud") {
    import spark.implicits._
    intercept[IllegalArgumentException](Salsa.run(spark,
      Seq("a").toDF("url"), Seq(("a", "a")).toDF("src", "dst"), 0))
  }
}
