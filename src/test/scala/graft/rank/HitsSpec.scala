package graft.rank

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** HITS must equal a local dense replay of the max-normalized algebra,
  * and drop edges whose endpoints are not nodes. */
class HitsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("hits-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val nodes = Seq("a", "b", "c", "d", "e") // e is isolated
  private val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"))

  private def localReplay(iters: Int): (Map[String, Double], Map[String, Double]) = {
    var hub = nodes.map(_ -> 1.0).toMap
    var auth = Map.empty[String, Double]
    for (_ <- 1 to iters) {
      val rawA = nodes.map(n => n -> edges.filter(_._2 == n).map(e => hub(e._1)).sum).toMap
      val mA = rawA.values.max
      auth = rawA.map { case (k, v) => k -> (if (mA == 0) v else v / mA) }
      val rawH = nodes.map(n => n -> edges.filter(_._1 == n).map(e => auth(e._2)).sum).toMap
      val mH = rawH.values.max
      hub = rawH.map { case (k, v) => k -> (if (mH == 0) v else v / mH) }
    }
    (hub, auth)
  }

  test("HITS equals the local dense replay; hub/authority structure is right") {
    import spark.implicits._
    val out = Hits.run(nodes.toDF("url"),
        edges.toDF("src", "dst"), iters = 8)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val (hub, auth) = localReplay(8)
    assert(out.keySet == nodes.toSet, "every node scored, isolated included")
    for (n <- nodes) {
      assert(math.abs(out(n)._1 - hub(n)) < 1e-9, s"hub($n)")
      assert(math.abs(out(n)._2 - auth(n)) < 1e-9, s"auth($n)")
    }
    assert(out("c")._2 == 1.0, "c has the most inlinks → top authority")
    assert(out("a")._1 == 1.0, "a links to the top pages → top hub")
    assert(out("e") == ((0.0, 0.0)), "isolated node scores zero")
  }

  test("edges touching unknown nodes are dropped") {
    import spark.implicits._
    val withGhost = edges ++ Seq(("x", "c"), ("c", "y"))
    val out = Hits.run(nodes.toDF("url"),
        withGhost.toDF("src", "dst"), iters = 8)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val (hub, auth) = localReplay(8)
    for (n <- nodes) {
      assert(math.abs(out(n)._1 - hub(n)) < 1e-9, s"hub($n)")
      assert(math.abs(out(n)._2 - auth(n)) < 1e-9, s"auth($n)")
    }
  }
}
