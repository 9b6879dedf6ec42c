package graft.crawl

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class RedirectsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("redirects-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def resolve(pairs: Seq[(String, String)]): Map[String, (String, Boolean)] = {
    import spark.implicits._
    Redirects.resolve(pairs.toDF("src", "dst"), rounds = 4).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getBoolean(2)))).toMap
  }

  test("chains resolve to their terminal") {
    val got = resolve(Seq(("a", "b"), ("b", "c"), ("x", "c")))
    assert(got("a") == (("c", true)))
    assert(got("b") == (("c", true)))
    assert(got("x") == (("c", true)))
    assert(got("c") == (("c", true))) // terminals resolve to themselves
  }

  test("a cycle rotates by 16 mod its length and reports non-terminal") {
    // 3-cycle: 16 ≡ 1 (mod 3) → each member advances one step
    val got = resolve(Seq(("x", "y"), ("y", "z"), ("z", "x")))
    assert(got("x") == (("y", false)))
    assert(got("y") == (("z", false)))
    assert(got("z") == (("x", false)))
  }

  test("a chain longer than 16 hops stops mid-chain and reports non-terminal") {
    val chain = (0 until 20).map(i => (s"u$i", s"u${i + 1}"))
    val got = resolve(chain)
    assert(got("u0") == (("u16", false))) // 16 hops deep, still a redirect
    assert(got("u5") == (("u20", true))) // reaches the terminal at hop 15
    assert(got("u19") == (("u20", true)))
  }

  test("duplicate redirect rows are harmless") {
    val got = resolve(Seq(("a", "b"), ("a", "b"), ("b", "c")))
    assert(got("a") == (("c", true)))
  }
}
