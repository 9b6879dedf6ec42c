package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming sessionizer (flatMapGroupsWithState custom state) must
  * produce exactly the batch window-function sessions. Trailing sessions
  * are closed deterministically by appending one far-future sentinel event
  * per user to the stream (the sentinel's own open session stays in state
  * and is never emitted).
  */
class StreamSessionizeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("sessionize-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming sessions == batch sessions on the events table") {
    import spark.implicits._
    val gap = 1800L
    val src = Files.createTempDirectory("sess").toString
    Files.copy(java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(src, "part-0.parquet"))

    // batch side reads ONLY the real file (the dir gains a sentinel file)
    val real = spark.read.parquet(s"$src/part-0.parquet")

    // sentinel file: one event per user, far past every real event; ts cast
    // to the source column's exact type (TimestampNTZ) so the stream schema
    // matches across files
    val tsType = real.schema("ts").dataType
    val maxSec = real.select(max(col("ts").cast("timestamp").cast("long"))).head().getLong(0)
    real.select(col("user_id")).distinct()
      .withColumn("event_id", col("user_id") + 10_000_000L)
      .withColumn("ts", (lit(maxSec) + gap * 10).cast("timestamp").cast(tsType))
      .withColumn("event_type", lit("sentinel"))
      .withColumn("value", lit(0.0))
      .withColumn("props", lit(""))
      .select(real.columns.map(col): _*) // align column order with the source file
      .write.mode("append").parquet(src)

    val stream = spark.readStream.schema(real.schema).parquet(src)
    val out = Sessionize.streaming(stream, gap)
    val q = out.writeStream
      .format("memory").queryName("sessions")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    def key(userId: Long, start: java.sql.Timestamp, end: java.sql.Timestamp,
            n: Long, sum: Double) =
      (userId, start.getTime / 1000, end.getTime / 1000, n, sum)

    val streamed = spark.sql("SELECT * FROM sessions").collect()
      .map(r => key(r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4))).toSet

    // batch keeps the source's TimestampNTZ type — cast for the comparison
    val batch = Sessionize.batch(real, gap)
      .withColumn("session_start", col("session_start").cast("timestamp"))
      .withColumn("session_end", col("session_end").cast("timestamp"))
      .collect()
      .map(r => key(r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4))).toSet

    assert(streamed.nonEmpty)
    assert(streamed == batch)
    // multi-session users exist (the fixture isn't one-session-per-user)
    assert(streamed.groupBy(_._1).exists(_._2.size > 1))
  }
}
