package graft.ml

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ShardBalanceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("shard-balance-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rows(n: Int): Seq[(Long, Long)] =
    (0 until n).map(i => (i.toLong, ((i * 31) % 97 + 1).toLong))

  private def literal(rs: Seq[(Long, Long)], s: Int): Map[Long, Int] =
    rs.sortBy { case (id, w) => (-w, id) }.zipWithIndex
      .map { case ((id, _), r) => id -> (r % s) }.toMap

  test("equals round-robin by size rank at several parallelism levels") {
    import spark.implicits._
    val data = rows(400)
    val want = literal(data, 8)
    for (parts <- Seq(1, 3, 8)) {
      val got = ShardBalance.assign(
          data.toDF("id", "w").repartition(parts), "id", col("w"),
          shards = 8, parts = parts)
        .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
      assert(got == want, s"diverged at parts=$parts")
    }
  }

  test("shard totals are balanced within one max item of the mean") {
    import spark.implicits._
    val data = rows(400)
    val sums = ShardBalance.summary(
        ShardBalance.assign(data.toDF("id", "w"), "id", col("w"), shards = 8))
      .collect().map(r => r.getLong(2))
    assert(sums.length == 8)
    val maxItem = data.map(_._2).max
    assert(sums.max - sums.min <= maxItem,
      s"imbalance ${sums.max - sums.min} exceeds one max item $maxItem")
  }

  test("shards=1 puts everything on shard 0; bad shard count is loud") {
    import spark.implicits._
    val df = rows(10).toDF("id", "w")
    assert(ShardBalance.assign(df, "id", col("w"), 1)
      .collect().forall(_.getInt(2) == 0))
    intercept[IllegalArgumentException] {
      ShardBalance.assign(df, "id", col("w"), 0)
    }
  }
}
