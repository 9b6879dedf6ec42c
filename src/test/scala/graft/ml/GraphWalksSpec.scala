package graft.ml

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraphWalksSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graph-walks-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // a -> {b, c}; b -> {a}; c is a dead end; duplicate edge collapses
  private val edges = Seq(("a", "b"), ("a", "c"), ("a", "c"), ("b", "a"))
  private val nodes = Seq("a", "b", "c")

  private def run(w: Int, l: Int) =
    GraphWalks.walks(spark, edges.toDF("src", "dst"),
        nodes.toDF("node"), w, l)
      .as[(String, Int, Int, String)].collect().toSeq
      .sortBy(r => (r._1, r._2, r._3))

  /** Literal walk replay. */
  private def literal(w: Int, l: Int) = {
    val adj = edges.distinct.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    (for (start <- nodes.sorted; wid <- 0 until w) yield {
      var cur = start
      var rows = List((start, wid, 0, start))
      var s = 0
      var alive = true
      while (s < l && alive) {
        adj.get(cur) match {
          case Some(nbrs) =>
            cur = nbrs((PortableHash.h60(s"$cur|$wid|$s") % nbrs.size).toInt)
            rows ::= ((start, wid, s + 1, cur))
            s += 1
          case None => alive = false
        }
      }
      rows.reverse
    }).flatten.sortBy(r => (r._1, r._2, r._3))
  }

  test("matches the literal hash-walk replay; dead ends stop early") {
    val got = run(2, 4)
    assert(got == literal(2, 4))
    // walks starting at dead-end c emit only step 0
    assert(got.filter(_._1 == "c").map(_._3).max == 0)
    // every step moves along a real edge
    val adj = edges.toSet
    got.groupBy(r => (r._1, r._2)).values.foreach { walk =>
      walk.sortBy(_._3).sliding(2).foreach {
        case Seq(x, y) => assert(adj.contains((x._4, y._4)))
        case _ =>
      }
    }
  }

  test("walks are reproducible across parallelism") {
    val a = run(2, 4)
    val b = GraphWalks.walks(spark,
        edges.toDF("src", "dst").repartition(7), nodes.toDF("node"), 2, 4)
      .as[(String, Int, Int, String)].collect().toSeq
      .sortBy(r => (r._1, r._2, r._3))
    assert(a == b)
  }

  test("bad args are loud") {
    intercept[IllegalArgumentException](run(0, 4))
    intercept[IllegalArgumentException](run(2, 0))
  }
}
