package graft.ml

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class CorpusLawsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("corpus-laws-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // 6 docs; term frequencies skewed so cf ranks are unambiguous; new
  // vocabulary keeps appearing so Heaps has signal
  private val triples = for {
    i <- 1 to 6
    (t, tf) <- Seq(("common", 8L), (s"mid$i", 3L)) ++
      (if (i % 2 == 0) Seq((s"rare$i", 1L)) else Nil)
  } yield (f"d$i%02d", t, tf)

  private def ols(pts: Seq[(Double, Double)]) = {
    val n = pts.size.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy - slope * sx) / n
    (math.rint(slope * 1e6) / 1e6, math.rint(icept * 1e6) / 1e6)
  }

  private def literal(topR: Int, cp: Int) = {
    val cf = triples.groupBy(_._2).view.mapValues(_.map(_._3).sum).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(topR)
    val zipf = ols(cf.zipWithIndex.map { case ((_, c), i) =>
      (math.log((i + 1).toDouble), math.log(c.toDouble))
    })
    val docs = triples.map(_._1).distinct.sorted.zipWithIndex
      .map { case (u, i) => u -> (i + 1L) }.toMap
    val d = docs.size
    val first = triples.groupBy(_._2).view
      .mapValues(_.map(t => docs(t._1)).min).toMap
    val cps = (1 to cp).map(j => j.toLong * d / cp).distinct.filter(_ >= 1)
    val heaps = ols(cps.map { n =>
      (math.log(n.toDouble), math.log(first.values.count(_ <= n).toDouble))
    })
    (zipf, heaps)
  }

  test("matches the literal OLS fits") {
    import spark.implicits._
    val got = CorpusLaws.fits(spark, triples.toDF("url", "term", "tf"), 10, 3)
      .as[(String, Long, Double, Double)].collect().toSeq
    val ((zs, zi), (hs, hi)) = literal(10, 3)
    assert(got == Seq(("heaps", 3L, hs, hi), ("zipf", 10L, zs, zi)))
  }

  test("slopes have the law-shaped signs") {
    import spark.implicits._
    val got = CorpusLaws.fits(spark, triples.toDF("url", "term", "tf"), 10, 3)
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got("zipf") < 0.0)         // frequency falls with rank
    assert(got("heaps") > 0.0 && got("heaps") <= 1.0) // sublinear growth
  }

  test("bad args are loud") {
    import spark.implicits._
    val df = triples.toDF("url", "term", "tf")
    intercept[IllegalArgumentException](CorpusLaws.zipfFit(df, 1))
    intercept[IllegalArgumentException](CorpusLaws.heapsFit(spark, df, 1))
  }
}
