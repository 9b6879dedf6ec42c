package graft.tables

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DataSkippingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("data-skipping-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshDir() =
    Files.createTempDirectory("graft-skip").toString

  /** A range-clustered table: 8 files, each owning a tight id range. */
  private def writeClustered(dir: String): Unit = {
    import spark.implicits._
    val df = (0 until 4000).map(i => (i.toLong, s"u$i", i % 7))
      .toDF("id", "url", "grp")
      .repartitionByRange(8, col("id"))
    TableIO.write(df, dir, "clustered")
  }

  test("pruned read returns exactly the full-scan rows and prunes files") {
    import spark.implicits._
    val dir = freshDir()
    writeClustered(dir)
    val n = DataSkipping.analyze(spark, dir, Seq("id", "url"))
    assert(n == 16, s"8 files x 2 columns, got $n")

    val total = TableIO.manifest(spark, dir).count(_.path.nonEmpty)
    val kept = DataSkipping.survivingFiles(spark, dir, "id", "1000", "1499")
    assert(kept.size < total, s"no pruning: $kept")

    val pruned = DataSkipping.readBetween(spark, dir, "id", "1000", "1499")
      .as[(Long, String, Int)].collect().sortBy(_._1)
    val full = TableIO.read(spark, dir)
      .where(col("id").between(1000, 1499))
      .as[(Long, String, Int)].collect().sortBy(_._1)
    assert(pruned.toSeq == full.toSeq && pruned.length == 500)
  }

  test("string-typed bounds prune too, and unanalyzed columns never prune") {
    import spark.implicits._
    val dir = freshDir()
    writeClustered(dir)
    DataSkipping.analyze(spark, dir, Seq("url"))
    val total = TableIO.manifest(spark, dir).count(_.path.nonEmpty)
    // id-clustered files carry LEXICOGRAPHICALLY tight url ranges too
    // (both "u1000" and "u1001" live in the ids-1000..1499 file), so a
    // string range probe prunes — and returns exactly the full-scan rows
    assert(DataSkipping.survivingFiles(spark, dir, "url", "u1000", "u1001").size < total)
    val pruned = DataSkipping.readBetween(spark, dir, "url", "u1000", "u1001")
      .as[(Long, String, Int)].collect().sortBy(_._1)
    val full = TableIO.read(spark, dir)
      .where(col("url") >= "u1000" && col("url") <= "u1001")
      .as[(Long, String, Int)].collect().sortBy(_._1)
    assert(pruned.toSeq == full.toSeq && pruned.nonEmpty)
    // the un-analyzed column keeps every file rather than mis-pruning
    assert(DataSkipping.survivingFiles(spark, dir, "grp", "2", "2").size == total)
    // and the read is still correct without any usable stats
    assert(DataSkipping.readBetween(spark, dir, "grp", "2", "2").count() ==
      TableIO.read(spark, dir).where(col("grp") === 2).count())
  }

  test("stats bind to the snapshot: time travel prunes with old bounds") {
    import spark.implicits._
    val dir = freshDir()
    writeClustered(dir)
    DataSkipping.analyze(spark, dir, Seq("id"))
    // second snapshot shifts ids by 10000; analyze it independently
    val df2 = (0 until 4000).map(i => (i + 10000L, s"v$i", i % 7))
      .toDF("id", "url", "grp").repartitionByRange(8, col("id"))
    TableIO.write(df2, dir, "rewrite")
    DataSkipping.analyze(spark, dir, Seq("id"))
    // current snapshot: the old range finds nothing and prunes everything
    assert(DataSkipping.survivingFiles(spark, dir, "id", "1000", "1499").isEmpty)
    assert(DataSkipping.readBetween(spark, dir, "id", "1000", "1499").count() == 0)
    // time travel to snapshot 1 still serves the old range, pruned
    val v1 = DataSkipping.readBetween(spark, dir, "id", "1000", "1499", Some(1L))
    assert(v1.count() == 500)
    assert(DataSkipping.survivingFiles(spark, dir, "id", "1000", "1499", Some(1L)).size < 8)
  }

  test("expiry reclaims the sidecar with the snapshot") {
    val dir = freshDir()
    writeClustered(dir)
    DataSkipping.analyze(spark, dir, Seq("id"))
    TableIO.write(TableIO.read(spark, dir), dir, "rewrite")
    TableIO.expireSnapshots(dir, keepLast = 1)
    assert(DataSkipping.stats(spark, dir, Some(2L)).isEmpty) // never analyzed
    intercept[IllegalStateException](DataSkipping.readBetween(
      spark, dir, "id", "0", "10", Some(1L))) // expired — loud via manifest
    assert(!Files.exists(TableIO.metaDir(dir).resolve("snapshot-1-stats.jsonl")))
  }

  test("mayOverlap compares numerically for numeric types") {
    // the divergence case: 9 IS inside numeric [5, 20], but the string
    // "9" sorts after "20" — a string compare on a numeric column would
    // wrongly prune a file that holds matching rows
    assert(DataSkipping.mayOverlap("BIGINT", Some("9"), Some("9"), "5", "20"))
    assert(!DataSkipping.mayOverlap("STRING", Some("9"), Some("9"), "5", "20"))
    assert(!DataSkipping.mayOverlap("BIGINT", Some("21"), Some("30"), "5", "20"))
    assert(DataSkipping.mayOverlap("BIGINT", Some("15"), Some("15"), "10", "20"))
    assert(DataSkipping.mayOverlap("DOUBLE", Some("19.5"), Some("25.0"), "10", "20"))
    assert(!DataSkipping.mayOverlap("DOUBLE", Some("20.5"), Some("25.0"), "10", "20"))
    assert(DataSkipping.mayOverlap("BIGINT", None, None, "10", "20"))
  }
}
