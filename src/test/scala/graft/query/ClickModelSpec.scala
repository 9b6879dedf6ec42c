package graft.query

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ClickModelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("click-model-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("divides clicks by examination mass, not impressions") {
    import spark.implicits._
    // u1: shown twice at position 1 (bias 15/16), clicked once → CTR 0.5
    // u2: shown twice at position 9 (bias 7/16), clicked once → same CTR,
    //     but HIGHER attractiveness — it got less examination
    val log = Seq(
      (0, "u1", 1, 1), (0, "u1", 1, 0),
      (0, "u2", 9, 1), (0, "u2", 9, 0)
    ).toDF("qid", "url", "position", "clicked")
    val got = ClickModel.attractiveness(log)
      .select("url", "impressions", "clicks", "attract")
      .as[(String, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      ("u1", 2L, 1L, math.rint(1.0 / (30.0 / 16) * 1e6) / 1e6),
      ("u2", 2L, 1L, math.rint(1.0 / (14.0 / 16) * 1e6) / 1e6)))
    assert(got(1)._4 > got(0)._4)
  }

  test("minImpressions drops thin rows") {
    import spark.implicits._
    val log = Seq(
      (0, "u1", 1, 1), (0, "u1", 2, 0), (0, "u2", 1, 1)
    ).toDF("qid", "url", "position", "clicked")
    val urls = ClickModel.attractiveness(log, minImpressions = 2L)
      .select("url").as[String].collect().toSeq
    assert(urls == Seq("u1"))
  }
}
