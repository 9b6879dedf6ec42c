package graft.rank

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Frontier-iterated BFS must produce exact min-hop distances. */
class BfsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("bfs-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(seeds: Seq[String], edges: Seq[(String, String)],
                  maxHops: Int): Map[String, Int] = {
    import spark.implicits._
    Bfs.hops(seeds.toDF("url"), edges.toDF("src", "dst"), maxHops)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
  }

  test("min hop wins on diamond + cycle; unreachable stays absent") {
    // a->b->c->a cycle, a->d, d->c (c reachable at hop 2 two ways),
    // e->f disconnected, c->gone dangling target
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "d",
      "d" -> "c", "e" -> "f", "c" -> "gone")
    val got = run(Seq("a"), edges, maxHops = 6)
    assert(got == Map("a" -> 0, "b" -> 1, "d" -> 1, "c" -> 2, "gone" -> 3))
  }

  test("multi-source: each node settles at the nearest seed's distance") {
    val edges = Seq("s1" -> "m", "m" -> "x", "s2" -> "x", "x" -> "y")
    val got = run(Seq("s1", "s2"), edges, maxHops = 6)
    assert(got == Map("s1" -> 0, "s2" -> 0, "m" -> 1, "x" -> 1, "y" -> 2))
  }

  test("maxHops truncates the expansion") {
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "d")
    val got = run(Seq("a"), edges, maxHops = 2)
    assert(got == Map("a" -> 0, "b" -> 1, "c" -> 2))
  }

  test("maxHops=0 returns the seeds only; duplicate seeds collapse") {
    val got = run(Seq("a", "a"), Seq("a" -> "b"), maxHops = 0)
    assert(got == Map("a" -> 0))
  }
}
