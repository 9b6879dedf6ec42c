package graft.query

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ShardSelectSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("shard-select-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // 3 shards: s0 is all about "galaxy", s1 mixed, s2 unrelated
  private val triples = Seq(
    ("s0/a", "galaxy", 5), ("s0/b", "galaxy", 3), ("s0/c", "galaxy", 4),
    ("s0/a", "engine", 1),
    ("s1/a", "galaxy", 1), ("s1/b", "engine", 2), ("s1/c", "prince", 2),
    ("s2/a", "prince", 3), ("s2/b", "officer", 2), ("s2/c", "soldier", 1))

  private def literal(queries: Seq[(Int, Seq[String])], b: Double) = {
    val shards = triples.map(_._1.take(2)).distinct.sorted
    val df = triples.groupBy(t => (t._1.take(2), t._2)).view.mapValues(_.size).toMap
    val cwm = triples.groupBy(_._1.take(2)).view.mapValues(_.map(_._3).sum.toLong).toMap
    val c = shards.size
    val avgCw = cwm.values.sum.toDouble / c
    val cf = triples.map(t => t._2).distinct
      .map(t => t -> shards.count(s => df.contains((s, t)))).toMap
    for ((qid, ts) <- queries; s <- shards) yield {
      val beliefs = ts.distinct.sorted.map { t =>
        val d = df.getOrElse((s, t), 0)
        if (d > 0) {
          val tp = d.toDouble / (d.toDouble + 50.0 + 150.0 * cwm(s).toDouble / avgCw)
          val ip = math.log((c + 0.5) / cf(t).toDouble) / math.log(c + 1.0)
          b + (1.0 - b) * tp * ip
        } else b
      }
      (qid, s, beliefs.foldLeft(0.0)(_ + _) / ts.distinct.size)
    }
  }

  private def run(queries: Seq[(Int, Seq[String])], topR: Int) = {
    import spark.implicits._
    ShardSelect.cori(spark, triples.toDF("url", "term", "tf"),
        substring_index(col("url"), "/", 1), queries, topR)
      .as[(Int, String, Int, Double)].collect().toSeq.sortBy(r => (r._1, r._3))
  }

  test("matches the literal CORI computation; topical shard wins") {
    val queries = Seq((0, Seq("galaxy", "engine")), (1, Seq("prince")))
    val got = run(queries, 3)
    val want = literal(queries, 0.4).groupBy(_._1).flatMap { case (_, ss) =>
      ss.sortBy(x => (-x._3, x._2)).zipWithIndex.map { case ((q, s, sc), i) =>
        (q, s, i + 1, math.rint(sc * 1e6) / 1e6)
      }
    }.toSeq.sortBy(r => (r._1, r._3))
    assert(got == want)
    // a shard with NO query term (belief stuck at b) always ranks last:
    // s2 has neither galaxy nor engine, so query 0 ranks it 3rd
    assert(got.find(r => r._1 == 0 && r._2 == "s2").get._3 == 3)
    // query 1 ("prince") prefers a shard that HAS prince over s0 (none)
    assert(got.find(r => r._1 == 1 && r._2 == "s0").get._3 == 3)
  }

  test("unknown terms leave every shard at the default belief, shard-asc ties") {
    val got = run(Seq((9, Seq("zzzunknown"))), 2)
    assert(got.map(_._2) == Seq("s0", "s1"))
    assert(got.map(_._4).distinct == Seq(0.4))
  }

  test("topR caps and bad args are loud") {
    import spark.implicits._
    assert(run(Seq((0, Seq("galaxy"))), 1).size == 1)
    val df = triples.toDF("url", "term", "tf")
    intercept[IllegalArgumentException](ShardSelect.cori(spark, df,
      substring_index(col("url"), "/", 1), Seq((0, Seq("x"))), 0))
    intercept[IllegalArgumentException](ShardSelect.cori(spark, df,
      substring_index(col("url"), "/", 1), Seq.empty, 1))
  }
}
