package graft.tables

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Exact column stats vs a hand-computed table, including null handling
  * in both the null counter and the distinct counter. */
class TableProfileSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("table-profile-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("profile = exact rows/nulls/distincts per column, col_name-ordered") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)](
      (1L, "x"), (1L, "y"), (2L, null), (null, "y"), (3L, null))
      .toDF("k", "s")
    val out = TableProfile.profile(df, Seq("s", "k"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("k", 5L, 1L, 3L),   // distinct ignores the null
      ("s", 5L, 2L, 2L)))
  }
}
