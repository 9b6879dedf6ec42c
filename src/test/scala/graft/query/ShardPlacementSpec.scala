package graft.query

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ShardPlacementSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("shard-placement-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def place(n: Int, workers: Seq[String], r: Int): Map[(String, Int), String] = {
    import spark.implicits._
    ShardPlacement.assign((0 until n).map(_.toString).toDF("sid"), "sid",
        workers, r)
      .as[(String, String, Int)].collect()
      .map { case (s, w, rep) => (s, rep) -> w }.toMap
  }

  test("matches a literal HRW computation and spreads load") {
    val workers = Seq("w0", "w1", "w2", "w3")
    val got = place(64, workers, 2)
    // literal recomputation with the same portable hash
    for (s <- 0 until 64) {
      val ranked = workers.map(w => (graft.ml.PortableHash.h60(s + "|" + w), w))
        .sortBy { case (h, w) => (-h, w) }.map(_._2)
      assert(got((s.toString, 1)) == ranked(0))
      assert(got((s.toString, 2)) == ranked(1))
    }
    // no worker owns everything as primary
    val primaries = got.collect { case ((_, 1), w) => w }.toSeq
    assert(primaries.distinct.size == 4)
  }

  test("adding a worker moves only the shards it wins (minimal reshuffle)") {
    val before = place(200, Seq("w0", "w1", "w2", "w3"), 1)
    val after = place(200, Seq("w0", "w1", "w2", "w3", "w4"), 1)
    val moved = (0 until 200).count(s =>
      before((s.toString, 1)) != after((s.toString, 1)))
    // every moved shard must have moved TO the new worker — nothing else
    // is allowed to change under HRW
    (0 until 200).foreach { s =>
      if (before((s.toString, 1)) != after((s.toString, 1)))
        assert(after((s.toString, 1)) == "w4")
    }
    // expected ~1/5 of shards; allow a wide deterministic band
    assert(moved > 10 && moved < 90, s"moved $moved of 200")
  }

  test("bad inputs are loud") {
    import spark.implicits._
    val df = Seq("0").toDF("sid")
    intercept[IllegalArgumentException](
      ShardPlacement.assign(df, "sid", Seq.empty, 1))
    intercept[IllegalArgumentException](
      ShardPlacement.assign(df, "sid", Seq("a", "a"), 1))
    intercept[IllegalArgumentException](
      ShardPlacement.assign(df, "sid", Seq("a"), 2))
  }
}
