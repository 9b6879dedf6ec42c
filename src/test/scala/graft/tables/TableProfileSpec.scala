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

  test("histogram: equi-width bins, max lands in the last bin, nulls out") {
    import spark.implicits._
    val df = (Seq[java.lang.Double](0.0, 1.0, 2.5, 5.0, 9.9, 10.0) :+
      (null: java.lang.Double)).toDF("v")
    val got = TableProfile.histogram(df, "v", bins = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).sortBy(_._1)
    // width 2.5 over [0,10]: [0,2.5)->bin0 {0,1}, [2.5,5)->bin1 {2.5},
    // [5,7.5)->bin2 {5}, rest->bin3 {9.9, 10 (max clamps into last bin)}
    assert(got.toSeq == Seq(
      (0, 2L, 0.0, 1.0), (1, 1L, 2.5, 2.5),
      (2, 1L, 5.0, 5.0), (3, 2L, 9.9, 10.0)))
  }

  test("histogram: constant column degenerates to one bin") {
    import spark.implicits._
    val df = Seq(7.0, 7.0, 7.0).toDF("v")
    val got = TableProfile.histogram(df, "v", bins = 5)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(got.toSeq == Seq((0, 3L)))
  }
}
