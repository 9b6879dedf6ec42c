package graft.rank

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Oriented wedge-join counts must equal brute-force triangle enumeration,
  * be insensitive to edge direction/duplication/self-loops, and emit
  * nothing for triangle-free graphs. */
class TrianglesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("triangles-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def count(edges: Seq[(String, String)]): Map[String, Long] = {
    import spark.implicits._
    Triangles.perNode(edges.toDF("src", "dst"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** Brute force: every 3-subset of nodes, all three edges present. */
  private def brute(edges: Seq[(String, String)]): Map[String, Long] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => if (e._1 < e._2) e else e.swap).toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val tris = for {
      i <- nodes.indices; j <- (i + 1) until nodes.size; k <- (j + 1) until nodes.size
      (x, y, z) = (nodes(i), nodes(j), nodes(k))
      if und((x, y)) && und((y, z)) && und((x, z))
    } yield (x, y, z)
    tris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (n, c) => n -> c.size.toLong }
  }

  test("K4: four triangles, every node in three") {
    val k4 = for {
      a <- Seq("p", "q", "r", "s"); b <- Seq("p", "q", "r", "s") if a < b
    } yield (a, b)
    assert(count(k4) == Map("p" -> 3L, "q" -> 3L, "r" -> 3L, "s" -> 3L))
  }

  test("triangle-free square emits nothing") {
    assert(count(Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))).isEmpty)
  }

  test("direction, duplicates and self-loops don't change counts") {
    val base = Seq(("a", "b"), ("b", "c"), ("a", "c"))
    val noisy = base ++ Seq(("b", "a"), ("c", "a"), ("a", "a"), ("a", "b"))
    assert(count(noisy) == Map("a" -> 1L, "b" -> 1L, "c" -> 1L))
    assert(count(noisy) == brute(noisy))
  }

  test("matches brute force on a deterministic pseudo-random graph") {
    // LCG-driven edge set over 24 nodes — dense enough for many triangles
    val edges = (0 until 300).map { i =>
      val x = (i * 1103515245L + 12345L) & 0x7fffffffL
      (s"n${(x % 24).toInt}", s"n${((x / 24) % 24).toInt}")
    }
    val got = count(edges)
    assert(got == brute(edges) && got.nonEmpty)
  }
}
