package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The streaming interval join must equal the batch join under micro-batch
  * slicing, with inclusive window boundaries and per-user isolation. */
class StreamJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("stream-join-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  // (event_id, user_id, ts) impressions; (event_id, user_id, ts, value) clicks
  private val imps = Seq(
    (1L, 10L, 1000L), (2L, 10L, 5000L), (3L, 20L, 1000L), (4L, 30L, 9000L))
  private val clicks = Seq(
    (101L, 10L, 1000L, 1.5),  // exactly at imp 1 start → match
    (102L, 10L, 1600L, 2.5),  // 600s after imp 1 (window 600) → boundary match
    (103L, 10L, 5601L, 3.5),  // 601s after imp 2 → NO match
    (104L, 20L, 1300L, 4.5),  // user 20 → matches imp 3 only, never imp 1
    (105L, 30L, 8999L, 5.5))  // 1s BEFORE imp 4 → no match

  private def impDf: DataFrame = {
    import spark.implicits._
    imps.map { case (e, u, t) => (e, u, ts(t)) }.toDF("event_id", "user_id", "ts")
  }
  private def clickDf: DataFrame = {
    import spark.implicits._
    clicks.map { case (e, u, t, v) => (e, u, ts(t), v) }
      .toDF("event_id", "user_id", "ts", "value")
  }

  private def collectPairs(df: DataFrame): Set[(Long, Long)] =
    df.select("imp_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("streamed in 1-file micro-batches == the batch join; boundaries inclusive") {
    val iDir = java.nio.file.Files.createTempDirectory("sj_imp").toString
    val cDir = java.nio.file.Files.createTempDirectory("sj_clk").toString
    impDf.repartition(3).write.mode("overwrite").parquet(iDir)
    clickDf.repartition(3).write.mode("overwrite").parquet(cDir)
    def stream(dir: String, schema: org.apache.spark.sql.types.StructType) =
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(dir)
    val name = s"sj_${System.nanoTime()}"
    // delay covers the whole data span: replay file order (mtime ties!)
    // then can never make a row late, so the batch equivalence is exact
    val q = StreamJoin.clickAttribution(
        stream(iDir, impDf.schema), stream(cDir, clickDf.schema), windowSec = 600,
        delay = "4 hours")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "streaming query timed out")
    val got = collectPairs(spark.table(name))
    val batch = collectPairs(
      StreamJoin.clickAttribution(impDf, clickDf, windowSec = 600))
    assert(got == batch)
    assert(got == Set((1L, 101L), (1L, 102L), (3L, 104L)),
      s"wrong matches: $got")
  }

  test("one click can attribute to several impressions in window") {
    import spark.implicits._
    val i2 = Seq((1L, 5L, ts(100L)), (2L, 5L, ts(200L)))
      .toDF("event_id", "user_id", "ts")
    val c2 = Seq((9L, 5L, ts(250L), 1.0)).toDF("event_id", "user_id", "ts", "value")
    assert(collectPairs(StreamJoin.clickAttribution(i2, c2, windowSec = 600)) ==
      Set((1L, 9L), (2L, 9L)))
  }
}
