package graft.ml

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class EpochShuffleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("epoch-shuffle-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("each epoch is a permutation matching the literal md5-key order, at every parallelism") {
    import spark.implicits._
    val ids = 0L until 97L
    val df = ids.toDF("doc_id")
    val expected = (for (e <- 0 until 3) yield {
      ids.sortBy(id => (md5hex(s"$e:$id"), id))
        .zipWithIndex.map { case (id, p) => (id, e) -> p.toLong }
    }).flatten.toMap
    for (p <- Seq(1, 5)) {
      val got = EpochShuffle.permute(df, "doc_id", epochs = 3, parts = p)
        .as[(Long, Int, Long)].collect()
        .map { case (id, e, pos) => (id, e) -> pos }.toMap
      assert(got == expected, s"parts=$p")
    }
  }

  test("epochs produce different orders and pos covers 0..n-1 in each") {
    import spark.implicits._
    val df = (0L until 50L).toDF("doc_id")
    val rows = EpochShuffle.permute(df, "doc_id", epochs = 2)
      .as[(Long, Int, Long)].collect()
    for (e <- 0 until 2) {
      val pos = rows.filter(_._2 == e).map(_._3).sorted
      assert(pos.toSeq == (0L until 50L), s"epoch $e not a permutation")
    }
    val order0 = rows.filter(_._2 == 0).sortBy(_._3).map(_._1).toSeq
    val order1 = rows.filter(_._2 == 1).sortBy(_._3).map(_._1).toSeq
    assert(order0 != order1)
  }

  test("bad epoch count is loud") {
    import spark.implicits._
    val df = Seq(1L).toDF("doc_id")
    intercept[IllegalArgumentException] {
      EpochShuffle.permute(df, "doc_id", epochs = 0)
    }
  }
}
