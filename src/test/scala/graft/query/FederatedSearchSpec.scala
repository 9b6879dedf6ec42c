package graft.query

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FederatedSearchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("federated-search-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // s0 galaxy-heavy, s1 mixed, s2 unrelated (ShardSelect's fixture shape)
  private val triples = Seq(
    ("s0/a", "galaxy", 5L), ("s0/b", "galaxy", 3L), ("s0/c", "galaxy", 4L),
    ("s0/a", "engine", 1L),
    ("s1/a", "galaxy", 1L), ("s1/b", "engine", 2L), ("s1/c", "prince", 2L),
    ("s2/a", "prince", 3L), ("s2/b", "officer", 2L), ("s2/c", "soldier", 1L))

  private def shardOf(u: String) = u.take(2)

  /** Literal federation: CORI beliefs (ShardSelect's literal, b=0.4),
    * shard-local BM25, belief-weighted merge. */
  private def literal(queries: Seq[(Int, Seq[String])], topR: Int, k: Int) = {
    val shards = triples.map(t => shardOf(t._1)).distinct.sorted
    val df = triples.groupBy(t => (shardOf(t._1), t._2)).view.mapValues(_.size.toLong).toMap
    val cwm = triples.groupBy(t => shardOf(t._1)).view.mapValues(_.map(_._3).sum).toMap
    val cS = shards.size
    val avgCw = cwm.values.sum.toDouble / cS
    val cfm = triples.map(_._2).distinct
      .map(t => t -> shards.count(s => df.contains((s, t)))).toMap
    val dl = triples.groupBy(t => (shardOf(t._1), t._1)).view.mapValues(_.map(_._3).sum).toMap
    val docsPer = triples.groupBy(t => shardOf(t._1)).view.mapValues(_.map(_._1).distinct.size).toMap
    val avgdl = docsPer.map { case (s, n) =>
      s -> dl.collect { case ((s2, _), d) if s2 == s => d }.sum.toDouble / n
    }
    val tfm = triples.map(t => (shardOf(t._1), t._1, t._2) -> t._3).toMap
    queries.flatMap { case (qid, ts0) =>
      val ts = ts0.distinct
      val beliefs = shards.map { s =>
        val bs = ts.sorted.map { t =>
          val d = df.getOrElse((s, t), 0L)
          if (d > 0) {
            val tp = d.toDouble / (d.toDouble + 50.0 + 150.0 * cwm(s).toDouble / avgCw)
            val ip = math.log((cS + 0.5) / cfm(t).toDouble) / math.log(cS + 1.0)
            0.4 + 0.6 * tp * ip
          } else 0.4
        }
        (s, bs.foldLeft(0.0)(_ + _) / ts.size)
      }
      val sel = beliefs.sortBy { case (s, b) => (-b, s) }.take(topR)
        .map { case (s, b) => (s, math.rint(b * 1e6) / 1e6) }
      val hits = sel.flatMap { case (s, belief) =>
        val urls = triples.collect {
          case (u, t, _) if shardOf(u) == s && ts.contains(t) => u
        }.distinct
        urls.map { u =>
          val nd = docsPer(s).toDouble
          val score = ts.flatMap { t =>
            tfm.get((s, u, t)).map { tf =>
              math.log((nd - df((s, t)) + 0.5) / (df((s, t)) + 0.5) + 1.0) *
                (tf * (1.2 + 1.0)) /
                (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl((s, u)) / avgdl(s)))
            }
          }.sum
          (s, u, belief * score)
        }
      }
      hits.sortBy { case (_, u, f) => (-f, u) }.take(k).zipWithIndex.map {
        case ((s, u, f), i) => (qid, s, i + 1, u, math.rint(f * 1e6) / 1e6)
      }
    }
  }

  private def run(queries: Seq[(Int, Seq[String])], topR: Int, k: Int) = {
    import spark.implicits._
    FederatedSearch.topK(spark, triples.toDF("url", "term", "tf"),
        substring_index(col("url"), "/", 1), queries, topR, k)
      .as[(Int, String, Int, String, Double)].collect().toSeq
      .sortBy(r => (r._1, r._3))
  }

  test("matches the literal CORI-weighted shard-local BM25 federation") {
    val qs = Seq((0, Seq("galaxy", "engine")), (1, Seq("prince")))
    assert(run(qs, 2, 5) == literal(qs, 2, 5))
  }

  test("only selected shards contribute") {
    // topR=1 for "prince": the prince-heavy shard wins selection; results
    // come from ONE shard only
    val got = run(Seq((0, Seq("prince"))), 1, 5)
    assert(got.nonEmpty && got.map(_._2).distinct.size == 1)
  }

  test("shard-local idf differs from global: scores are shard-consistent") {
    val got = run(Seq((0, Seq("galaxy"))), 3, 10)
    // every returned row's score is positive and ranked strictly by score
    assert(got.map(_._5).forall(_ > 0))
    assert(got.sortBy(r => (-r._5, r._4)).map(_._3) == got.map(_._3))
  }
}
