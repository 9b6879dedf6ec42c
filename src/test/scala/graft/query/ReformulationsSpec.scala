package graft.query

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ReformulationsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("reformulations-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("counts consecutive same-user pairs within the gap; filters work") {
    import spark.implicits._
    val log = Seq(
      // u1: a→b (30s, counts), b→b (20s, same query — dropped),
      //     b→c (100s — over the gap), c→a (10s, counts)
      ("u1", ts(0), "a"), ("u1", ts(30), "b"), ("u1", ts(50), "b"),
      ("u1", ts(150), "c"), ("u1", ts(160), "a"),
      // u2: a→b again (counts → cnt 2), then b→a (counts once — below
      // minCount 2, filtered)
      ("u2", ts(0), "a"), ("u2", ts(10), "b"), ("u2", ts(20), "a"),
      // u3: c→a (counts → c→a cnt 2)
      ("u3", ts(0), "c"), ("u3", ts(5), "a")
    ).toDF("user", "ts", "query")
    val got = Reformulations.mine(log, gapSec = 60, minCount = 2, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", "b", 2L), ("c", "a", 2L)))
  }

  test("ordering is (count desc, prev asc, next asc) and k truncates") {
    import spark.implicits._
    val log = (1 to 3).flatMap(i => Seq(
        (s"u$i", ts(0), "x"), (s"u$i", ts(1), "y"))) ++
      (1 to 2).flatMap(i => Seq(
        (s"v$i", ts(0), "a"), (s"v$i", ts(1), "b"),
        (s"v$i", ts(2), "a"))) // a→b and b→a, each twice
    val df = log.toDF("user", "ts", "query")
    val all = Reformulations.mine(df, 60, 1, 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(all == Seq(("x", "y", 3L), ("a", "b", 2L), ("b", "a", 2L)))
    val top1 = Reformulations.mine(df, 60, 1, 1).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(top1 == Seq(("x", "y")))
  }

  test("users never cross: identical adjacent queries from different users don't pair") {
    import spark.implicits._
    val log = Seq(("u1", ts(0), "a"), ("u2", ts(1), "b"))
      .toDF("user", "ts", "query")
    assert(Reformulations.mine(log, 60, 1, 10).count() == 0)
  }
}
