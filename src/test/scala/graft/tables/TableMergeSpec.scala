package graft.tables

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** MERGE must upsert, insert and delete by key in one changeset, leave the
  * pre-merge snapshot time-travelable, and refuse a duplicate-key
  * changeset loudly. */
class TableMergeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("table-merge-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("upsert + insert + delete in one changeset; old snapshot survives") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_merge").toString
    val v1 = TableIO.write(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "body"), dir, "append")
    val changes = Seq(
      (2L, "B2", "upsert"),   // replace
      (9L, "i9", "upsert"),   // insert
      (3L, "", "delete"))     // remove
      .toDF("id", "body", "_op")
    val v2 = TableIO.merge(spark, dir, changes, "id")
    assert(v2 == v1 + 1)
    assert(rows(TableIO.read(spark, dir)) ==
      Set((1L, "a"), (2L, "B2"), (9L, "i9")))
    assert(rows(TableIO.read(spark, dir, Some(v1))) ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("duplicate keys and unknown ops are refused") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_merge2").toString
    TableIO.write(Seq((1L, "a")).toDF("id", "body"), dir, "append")
    val dup = Seq((1L, "x", "upsert"), (1L, "y", "upsert"))
      .toDF("id", "body", "_op")
    val e1 = intercept[IllegalArgumentException](
      TableIO.merge(spark, dir, dup, "id"))
    assert(e1.getMessage.contains("duplicate keys"))
    val bad = Seq((1L, "x", "replace")).toDF("id", "body", "_op")
    val e2 = intercept[IllegalArgumentException](
      TableIO.merge(spark, dir, bad, "id"))
    assert(e2.getMessage.contains("unknown ops"))
    val nullOp = Seq((1L, "x", null.asInstanceOf[String]))
      .toDF("id", "body", "_op")
    val e3 = intercept[IllegalArgumentException](
      TableIO.merge(spark, dir, nullOp, "id"))
    assert(e3.getMessage.contains("<null>"))
  }

  test("delete of every row commits a readable empty snapshot") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_merge3").toString
    TableIO.write(Seq((1L, "a")).toDF("id", "body"), dir, "append")
    TableIO.merge(spark, dir,
      Seq((1L, "", "delete")).toDF("id", "body", "_op"), "id")
    assert(TableIO.read(spark, dir).count() == 0L)
  }
}
