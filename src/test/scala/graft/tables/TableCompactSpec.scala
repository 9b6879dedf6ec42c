package graft.tables

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Compaction rewrites bytes, never data: fewer files, identical rows,
  * preserved lineage, time-travelable pre-compaction snapshot, no-op when
  * already compact. */
class TableCompactSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("table-compact-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpDir(): String =
    Files.createTempDirectory("graft_compact").toString

  private def parquetFiles(root: Path): Seq[Path] = {
    val s = Files.walk(root)
    try s.iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .toSeq
    finally s.close()
  }

  test("partitioned compact: 1 file/partition, rows identical, lineage kept") {
    import spark.implicits._
    val dir = tmpDir()
    val df = (1 to 400).map(i => (i.toLong, s"g${i % 3}", s"payload $i"))
      .toDF("id", "grp", "body")
      .repartition(8, col("id")) // up to 8 files per partition value
    val v1 = TableIO.write(df, dir, "append", Some("grp"),
      Map("g0" -> "fp0", "g1" -> "fp1", "g2" -> "fp2"))
    val filesBefore = parquetFiles(Files.createDirectories(
      java.nio.file.Paths.get(dir, "data", s"snap-$v1"))).size
    assert(filesBefore > 3, s"setup should fragment, got $filesBefore files")

    val v2 = TableIO.compact(spark, dir, Some("grp"))
    assert(v2 == v1 + 1)
    val filesAfter = parquetFiles(
      java.nio.file.Paths.get(dir, "data", s"snap-$v2")).size
    assert(filesAfter == 3, s"expected 1 file per partition, got $filesAfter")

    val before = TableIO.read(spark, dir, Some(v1))
      .collect().map(_.toString).sorted
    val after = TableIO.read(spark, dir, Some(v2))
      .collect().map(_.toString).sorted
    assert(before.sameElements(after), "compaction must not change data")
    assert(TableIO.lineage(spark, dir, Some(v2)) ==
      Map("g0" -> "fp0", "g1" -> "fp1", "g2" -> "fp2"),
      "lineage fingerprints must carry over")
    assert(TableIO.snapshotMeta(spark, dir, v2).get.operation == "compact")

    // already compact -> no-op, same id
    assert(TableIO.compact(spark, dir, Some("grp")) == v2)

    // pre-compaction snapshot expires; compacted snapshot still reads
    assert(TableIO.expireSnapshots(dir, keepLast = 1) == Seq(v1))
    assert(TableIO.read(spark, dir, Some(v2)).count() == 400)
    intercept[IllegalStateException] {
      TableIO.read(spark, dir, Some(v1))
    }
  }

  test("compact preserves numeric-LOOKING string partition values verbatim") {
    import spark.implicits._
    // "01".."03" would be inferred as integers 1..3 by Spark's partition
    // type inference — the recorded-schema read must keep them strings so
    // the rewrite reproduces the exact directory names and lineage keys
    val dir = tmpDir()
    val df = (1 to 90).map(i => (i.toLong, f"0${i % 3 + 1}%s"))
      .toDF("id", "month").repartition(6, col("id"))
    val v1 = TableIO.write(df, dir, "append", Some("month"),
      Map("01" -> "f1", "02" -> "f2", "03" -> "f3"))
    val v2 = TableIO.compact(spark, dir, Some("month"))
    assert(v2 == v1 + 1)
    val months = TableIO.read(spark, dir, Some(v2))
      .select("month").distinct().collect().map(_.getString(0)).sorted
    assert(months.toSeq == Seq("01", "02", "03"),
      s"partition values mutated by the rewrite: ${months.toSeq}")
    assert(TableIO.lineage(spark, dir, Some(v2)) ==
      Map("01" -> "f1", "02" -> "f2", "03" -> "f3"),
      "lineage keys must survive the rewrite")
  }

  test("unpartitioned compact honors targetRowsPerFile; resume still reuses") {
    import spark.implicits._
    val dir = tmpDir()
    val df = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(10, col("id"))
    val v1 = TableIO.write(df, dir, "append")
    val v2 = TableIO.compact(spark, dir, None, targetRowsPerFile = 500L)
    assert(v2 == v1 + 1)
    val files = parquetFiles(
      java.nio.file.Paths.get(dir, "data", s"snap-$v2")).size
    assert(files == 2, s"1000 rows / 500-row target = 2 files, got $files")
    assert(TableIO.read(spark, dir, Some(v2)).count() == 1000)
    // compact of the compacted table: no-op at the same target
    assert(TableIO.compact(spark, dir, None, targetRowsPerFile = 500L) == v2)
  }

  test("resumable writes are born compact; compact no-ops and resume reuses") {
    import spark.implicits._
    val dir = tmpDir()
    def input(parts: Set[String]) =
      (1 to 300).map(i => (i.toLong, s"p${i % 4}")).toDF("id", "part")
        .filter(col("part").isin(parts.toSeq: _*))
        .repartition(6, col("id"))
    val fps = (0 until 4).map(i => s"p$i" -> s"fp$i").toMap
    val (v1, _, _) = TableIO.writeResumable(spark, dir, "build", "part", fps,
      parts => input(parts))
    // writeResumable already collapses rebuilt partitions to one file per
    // value, so compaction recognizes the table as compact and no-ops
    assert(TableIO.compact(spark, dir, Some("part")) == v1)
    // and the NEXT resumable write still reuses all 4 partitions
    val (_, rebuilt, reused) = TableIO.writeResumable(spark, dir, "build",
      "part", fps, parts => input(parts))
    assert(rebuilt.isEmpty && reused == fps.keySet,
      s"resume broken: rebuilt=$rebuilt")
    assert(TableIO.read(spark, dir).count() == 300)
  }
}
