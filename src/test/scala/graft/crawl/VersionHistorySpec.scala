package graft.crawl

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Intervals must collapse consecutive identical fetches, reopen a NEW
  * version when old content returns later (A→B→A is three versions, not
  * two), bound each version by its successor, and leave the live version
  * open. */
class VersionHistorySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("version-history-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("A A B A collapses to three intervals with correct bounds") {
    import spark.implicits._
    val fetches = Seq(
      ("u1", 1L, "A"), ("u1", 2L, "A"), ("u1", 3L, "B"), ("u1", 4L, "A"),
      ("u2", 1L, "X"))
      .toDF("url", "gen", "content")
    val got = VersionHistory.intervals(fetches, "url", "gen", "content")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4))).toSet
    assert(got == Set(
      ("u1", 1L, 1L, 3L),   // A lives [1,3)
      ("u1", 2L, 3L, 4L),   // B lives [3,4)
      ("u1", 3L, 4L, -1L),  // A again, NEW version, live
      ("u2", 1L, 1L, -1L)))
  }

  test("single-version url is one open interval; fingerprints differ per content") {
    import spark.implicits._
    val fetches = Seq(("u", 1L, "same"), ("u", 2L, "same"), ("u", 3L, "same"))
      .toDF("url", "gen", "content")
    val rows = VersionHistory.intervals(fetches, "url", "gen", "content").collect()
    assert(rows.length == 1 && rows(0).getLong(1) == 1L && rows(0).isNullAt(4))
  }
}
