package graft.crawl

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class PolitenessSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("politeness-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val frontier = Seq(
    ("http://a/1", "a", 5L), ("http://a/2", "a", 9L), ("http://a/3", "a", 9L),
    ("http://b/1", "b", 1L), ("http://b/2", "b", 2L),
    ("http://c/1", "c", 7L))
  private val delays = Seq(("a", 500L), ("b", 2000L)) // c missing → default

  private def run(fetchers: Int = 4) =
    Politeness.schedule(frontier.toDF("url", "host", "priority"),
        delays.toDF("host", "delay_ms"), fetchers, defaultDelayMs = 1000L)
      .as[(String, String, Int, Long, Long)].collect().toSeq
      .sortBy(r => (r._2, r._4))

  test("per-host spacing honors the delay, priority-desc url-asc order") {
    val got = run()
    val a = got.filter(_._2 == "a")
    // priority 9 ties broken by url asc: /2 before /3, then /1
    assert(a.map(_._1) == Seq("http://a/2", "http://a/3", "http://a/1"))
    assert(a.map(_._5) == Seq(0L, 500L, 1000L))
    val b = got.filter(_._2 == "b")
    assert(b.map(_._1) == Seq("http://b/2", "http://b/1"))
    assert(b.map(_._5) == Seq(0L, 2000L))
  }

  test("missing host takes the default delay; fetcher is host-affine") {
    val got = run()
    assert(got.filter(_._2 == "c").map(_._5) == Seq(0L))
    // same host → same fetcher, stable across rows
    got.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).distinct.size == 1)
    }
    assert(got.forall(r => r._3 >= 0 && r._3 < 4))
  }

  test("consecutive same-host fetches are never closer than the delay") {
    val got = run()
    got.groupBy(_._2).foreach { case (host, rows) =>
      val d = delays.toMap.getOrElse(host, 1000L)
      rows.sortBy(_._4).sliding(2).foreach {
        case Seq(x, y) => assert(y._5 - x._5 == d)
        case _ =>
      }
    }
  }

  test("bad args are loud") {
    val f = frontier.toDF("url", "host", "priority")
    val d = delays.toDF("host", "delay_ms")
    intercept[IllegalArgumentException](Politeness.schedule(f, d, 0, 1000L))
    intercept[IllegalArgumentException](Politeness.schedule(f, d, 4, -1L))
  }
}
