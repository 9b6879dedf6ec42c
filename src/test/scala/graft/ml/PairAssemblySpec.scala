package graft.ml

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class PairAssemblySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("pair-assembly-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val goodText =
    "the quick brown fox jumps over the lazy dog and it was for that reason good"

  test("joins on id, gates quality, dedups identical content pairs to the min id") {
    import spark.implicits._
    val assets = Multimodal.generateAssets(spark, 6)
    // captions 0 and 3 are IDENTICAL text → same caption_md5; their assets
    // differ (distinct media) → both pairs survive. 1 is garbage (fails
    // the gate). 2 and 4 are distinct good captions. 5 has no caption.
    val captions = Seq(
      (0L, goodText), (1L, "!!!???***"), (2L, goodText + " two"),
      (3L, goodText), (4L, goodText + " four")).toDF("id", "text")
    val got = PairAssembly.assemble(captions, assets, minQuality = 0.5)
      .collect().map(r => r.getLong(0)).sorted
    assert(got.toSeq == Seq(0L, 2L, 3L, 4L))
  }

  test("true duplicate (caption, media) content pairs collapse to one row keeping the min id") {
    import spark.implicits._
    // two assets with IDENTICAL bytes (hand-built) + identical captions
    val media = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)
    val assets = Seq(
      MediaAsset(0L, "image", media, 0, 0, 0),
      MediaAsset(1L, "image", media, 0, 0, 0)).toDS()
    val captions = Seq((0L, goodText), (1L, goodText)).toDF("id", "text")
    val rows = PairAssembly.assemble(captions, assets, minQuality = 0.0)
      .collect()
    assert(rows.length == 1)
    assert(rows(0).getLong(0) == 0L && rows(0).getLong(1) == 0L)
  }

  test("quality rides along and the gate boundary is inclusive") {
    import spark.implicits._
    val assets = Multimodal.generateAssets(spark, 2)
    val captions = Seq((0L, goodText)).toDF("id", "text")
    val r = PairAssembly.assemble(captions, assets, minQuality = 0.0).head()
    val q = r.getDouble(5)
    assert(q > 0.0 && q <= 1.0)
    // raising the gate just above this caption's quality drops it
    assert(PairAssembly.assemble(captions, assets, q + 0.01).count() == 0)
    assert(PairAssembly.assemble(captions, assets, q).count() == 1)
  }
}
