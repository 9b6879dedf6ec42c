package graft.tables

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The column-expression Z-key must equal the bit-twiddled reference, and
  * the Z-ordered layout must localize BOTH dimensions' box queries into
  * fewer files than a single-column sort. */
class ZOrderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("zorder-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zKey equals the reference interleave") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 3L), (65535L, 65535L),
      (12345L, 54321L), (1L, 65535L))
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zKey(col("x"), col("y"), 16).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { case (x, y) =>
      assert(got((x, y)) == mortonRef(x, y, 16), s"($x,$y)")
    }
  }

  /** Files holding at least one row of a query box, under a given layout. */
  private def filesHit(dir: String, pred: org.apache.spark.sql.Column): Long =
    spark.read.parquet(dir).filter(pred)
      .select(input_file_name()).distinct().count()

  test("z-layout localizes both dimensions; x-sort localizes only x") {
    import spark.implicits._
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val zDir = java.nio.file.Files.createTempDirectory("zo_z").toString
    val xDir = java.nio.file.Files.createTempDirectory("zo_x").toString
    ZOrder.writeZOrdered(grid, zDir, "x", "y", bits = 6, numFiles = 16)
    grid.repartitionByRange(16, col("x"), col("y"))
      .sortWithinPartitions("x", "y")
      .write.mode("overwrite").parquet(xDir)

    val yBox = col("y") < 8         // 1/8 of rows
    val xBox = col("x") < 8
    // x-sorted layout: every file spans all y values → all 16 files hit
    assert(filesHit(xDir, yBox) == 16L)
    // z-layout: a y-stripe lives in a compact set of z-ranges → few files
    assert(filesHit(zDir, yBox) <= 8L,
      s"z-layout y-box hit ${filesHit(zDir, yBox)} files")
    // and the z-layout still localizes x too (x-sort trivially does)
    assert(filesHit(zDir, xBox) <= 8L)
    assert(filesHit(xDir, xBox) <= 4L)
    // layouts hold identical data
    assert(spark.read.parquet(zDir).count() == 4096L &&
      spark.read.parquet(xDir).count() == 4096L)
  }
}
