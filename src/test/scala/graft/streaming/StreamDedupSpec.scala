package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Dedup state must span micro-batches (a duplicate in a LATER file is
  * dropped), the chained hourly windows must equal the batch rollup over
  * distinct events, and a very-late first arrival must be dropped rather
  * than re-emit a closed window (append-mode correctness). */
class StreamDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("stream-dedup-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  /** Writes each row group as its own parquet file with strictly
    * increasing mtimes so FileStreamSource (oldest-first) replays them in
    * list order, one file per micro-batch. */
  private def replayDirs(batches: Seq[Seq[(Long, Long, Double)]]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sd_src")
    batches.zipWithIndex.foreach { case (rows, i) =>
      val sub = java.nio.file.Files.createTempDirectory("sd_stage")
      rows.map { case (id, sec, v) => (id, ts(sec), v) }
        .toDF("event_id", "ts", "value")
        .coalesce(1).write.mode("overwrite").parquet(sub.toString)
      val listing = java.nio.file.Files.list(sub)
      val part =
        try listing.toArray.map(_.toString).filter(_.endsWith(".parquet")).head
        finally listing.close()
      val dst = dir.resolve(f"batch-$i%03d.parquet")
      java.nio.file.Files.copy(java.nio.file.Paths.get(part), dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1_000_000_000_000L + i * 60_000L))
    }
    dir.toString
  }

  private def run(dir: String, delay: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "event_id BIGINT, ts TIMESTAMP, value DOUBLE")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val name = s"sd_${System.nanoTime()}"
    val q = StreamDedup.dedupedHourlyCounts(stream, "event_id", "ts", delay)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "streaming query timed out")
    spark.table(name)
  }

  private def rows(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getTimestamp(0).getTime / 1000L,
      r.getLong(1), r.getDouble(2))).toSet

  test("cross-batch duplicate dropped; windows equal the distinct-batch rollup") {
    val dir = replayDirs(Seq(
      Seq((1L, 1000L, 1.0), (2L, 2000L, 2.0)),   // hour 0
      Seq((1L, 1000L, 1.0), (3L, 3700L, 4.0)),   // dup of e1 + hour-1 event
      Seq((-1L, 4 * 3600L + 10L, 0.0))))          // heartbeat: flushes, never emits
    assert(rows(run(dir, "1 hour")) ==
      Set((0L, 2L, 3.0), (3600L, 1L, 4.0)))
  }

  test("a first arrival behind an already-emitted window is dropped, never re-emits it") {
    // hour 0 finalizes at batch 2 (watermark passed 3600 after batch 1);
    // the very-late e9 then arrives in batch 3 — it must not create a
    // second hour-0 row (append mode emits each window at most once).
    val dir = replayDirs(Seq(
      Seq((1L, 1000L, 1.0)),
      Seq((2L, 2 * 3600L, 2.0)),
      Seq((3L, 3 * 3600L, 3.0)),
      Seq((9L, 1200L, 8.0)),
      Seq((-1L, 8 * 3600L, 0.0))))
    val got = run(dir, "10 seconds")
    assert(got.filter(col("hour") === ts(0L)).count() == 1L)
    assert(rows(got) ==
      Set((0L, 1L, 1.0), (2 * 3600L, 1L, 2.0), (3 * 3600L, 1L, 3.0)))
  }
}
