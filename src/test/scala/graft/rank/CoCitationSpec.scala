package graft.rank

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class CoCitationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("cocitation-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("counts shared citing sources; the outdegree cap drops hub citers") {
    import spark.implicits._
    // s1,s2,s3 all cite (x,y): co-cited 3×; s1,s2 cite z too → (x,z),(y,z) 2×;
    // hub cites EVERYTHING but exceeds the cap → contributes nothing
    val edges = Seq(
      ("s1", "x"), ("s1", "y"), ("s1", "z"),
      ("s2", "x"), ("s2", "y"), ("s2", "z"),
      ("s3", "x"), ("s3", "y"),
      ("hub", "x"), ("hub", "y"), ("hub", "z"), ("hub", "w")).toDF("src", "dst")
    val got = RelatedPages.coCitation(edges, maxOutdegree = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("x", "y", 3L), ("x", "z", 2L), ("y", "z", 2L)))
    // with the cap raised the hub's pairs (including w) appear
    val uncapped = RelatedPages.coCitation(edges, maxOutdegree = 10, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(uncapped.contains(("w", "x", 1L)))
    assert(uncapped.contains(("x", "y", 4L)))
  }

  test("duplicate edges count once") {
    import spark.implicits._
    val edges = Seq(("s1", "x"), ("s1", "x"), ("s1", "y")).toDF("src", "dst")
    val got = RelatedPages.coCitation(edges, maxOutdegree = 10, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("x", "y", 1L)))
  }
}
