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

    // full-millisecond precision: the streaming state carries the ORIGINAL
    // event timestamps (round-2 advice fix), so no truncation masking here
    def key(userId: Long, start: java.sql.Timestamp, end: java.sql.Timestamp,
            n: Long, sum: Double) =
      (userId, start.getTime, end.getTime, n, sum)

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

  test("late-but-admitted events merge with batch-identical bounds (out-of-order stream)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val gap = 5L
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
    val events = mem.toDF().toDF("event_id", "ts", "user_id", "value")
    val out = Sessionize.streamingWithTimeout(events, gap, delay = "10 seconds")
    val q = out.writeStream.format("memory").queryName("sessions_ooo")
      .outputMode("append").start()
    try {
      def t(ms: Long) = new java.sql.Timestamp(ms)
      // in-order events at 100s and 105s
      mem.addData((1L, t(100000L), 1L, 1.0), (2L, t(105000L), 1L, 2.0))
      q.processAllAvailable()
      // a LATE event at 98s — inside the 10s out-of-orderness bound; batch
      // semantics put it in the SAME session (sorted gaps 2s, 5s ≤ gap)
      mem.addData((3L, t(98000L), 1L, 4.0))
      q.processAllAvailable()
      // a far event closes the session once everything below ripens
      mem.addData((4L, t(200000L), 1L, 8.0))
      q.processAllAvailable()
      q.processAllAvailable() // timeout batch after the watermark advance
      val rows = spark.sql("SELECT * FROM sessions_ooo").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
          r.getTimestamp(2).getTime, r.getLong(3), r.getDouble(4))).toSet
      // the closed session spans 98s..105s with all three events — an eager
      // fold would have rewound session_end to 98s and split it
      assert(rows == Set((1L, 98000L, 105000L, 3L, 7.0)),
        s"expected the late event merged batch-identically, got $rows")
    } finally q.stop()
  }

  test("EventTimeTimeout flushes idle trailing sessions without a sentinel") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val gap = 1800L
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
    val events = mem.toDF().toDF("event_id", "ts", "user_id", "value")
    val out = Sessionize.streamingWithTimeout(events, gap)
    val q = out.writeStream.format("memory").queryName("sessions_to")
      .outputMode("append").start()
    try {
      def t(ms: Long) = new java.sql.Timestamp(ms)
      // user 1: two events 100s apart, with sub-second parts that the
      // output must preserve exactly
      mem.addData((1L, t(1000250L), 1L, 2.5), (2L, t(1100750L), 1L, 1.5))
      q.processAllAvailable()
      // no session closed yet (user 1 idle, watermark at its own events)
      assert(spark.sql("SELECT * FROM sessions_to").count() == 0)
      // another user far in the future pushes the watermark past
      // user 1's end + gap → the idle session must flush via timeout
      mem.addData((3L, t(100000000L), 99L, 0.0))
      q.processAllAvailable()
      q.processAllAvailable() // timeout fires on the batch AFTER the watermark advance
      val rows = spark.sql("SELECT * FROM sessions_to").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
          r.getTimestamp(2).getTime, r.getLong(3), r.getDouble(4))).toSet
      assert(rows == Set((1L, 1000250L, 1100750L, 2L, 4.0)),
        s"expected user 1's exact-millis session, got $rows")
      // user 99's open session stays in state (watermark hasn't passed it)
      assert(!rows.exists(_._1 == 99L))
    } finally q.stop()
  }

  test("the out-of-order buffer cap fails loudly instead of growing one key's state") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
    val events = mem.toDF().toDF("event_id", "ts", "user_id", "value")
    // a huge delay keeps every event above the watermark (still buffered);
    // cap 2 makes the third buffered event of one user an overflow
    val out = Sessionize.streamingWithTimeout(events, gapSec = 5L,
      delay = "3600 seconds", maxBufferedPerKey = 2)
    val q = out.writeStream.format("memory").queryName("sessions_cap")
      .outputMode("append").start()
    try {
      def t(ms: Long) = new java.sql.Timestamp(ms)
      mem.addData((1L, t(100000L), 1L, 1.0), (2L, t(101000L), 1L, 1.0),
        (3L, t(102000L), 1L, 1.0))
      val e = intercept[Exception] { q.processAllAvailable() }
      def messages(x: Throwable): Seq[String] =
        if (x == null) Nil else Option(x.getMessage).toSeq ++ messages(x.getCause)
      assert(messages(e).exists(_.contains("buffered out-of-order events")),
        s"expected the loud buffer-cap failure, got: ${messages(e).mkString(" | ")}")
    } finally q.stop()
  }
}
