package graft.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GlobalRankSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("global-rank-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("ranks equal a literal sort at every parallelism") {
    import spark.implicits._
    // adversarial: heavy duplicate keys, so the unique-id tiebreaker and
    // range-partition boundaries both get exercised
    val rows = (0L until 200L).map(i => (i, (i % 7).toString))
    val df = rows.toDF("id", "k")
    val expected = rows.sortBy { case (id, k) => (k, id) }
      .zipWithIndex.map { case ((id, _), r) => id -> r.toLong }.toMap
    for (p <- Seq(1, 3, 8)) {
      val got = GlobalRank.zipWithRank(df,
          Seq(col("k").asc, col("id").asc), parts = p)
        .select("id", "rank").as[(Long, Long)].collect().toMap
      assert(got == expected, s"parts=$p")
    }
  }

  test("existing rank column is refused loudly") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("id", "rank")
    val e = intercept[IllegalArgumentException] {
      GlobalRank.zipWithRank(df, Seq(col("id").asc))
    }
    assert(e.getMessage.contains("rank"))
  }
}
