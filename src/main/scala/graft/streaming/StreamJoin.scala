package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream event-time interval join — click attribution: each click
  * joins the same user's impressions from the preceding `windowSec`
  * seconds. The third Structured Streaming state primitive the engine
  * serves (windowed aggregation → StreamIngest, keyed timeout state →
  * Sessionize, symmetric join state → here).
  *
  * Both sides carry watermarks and the join condition carries an
  * event-time RANGE, which is exactly what lets Spark bound the join
  * state: an impression can be evicted once the click-side watermark
  * passes imp_ts + window, a click once the impression-side watermark
  * passes click_ts — without the range the state grows forever and the
  * job dies at stream scale, not in a test. INNER join output is
  * batch-equivalent under any micro-batch slicing (matches emit when both
  * sides have arrived; no timeout-dependent rows like an outer join's
  * null side), which is what makes the batch SQL oracle exact.
  */
object StreamJoin {

  /** @param impressions streaming frame: `event_id`, `user_id`, `ts`
    * @param clicks      streaming frame: `event_id`, `user_id`, `ts`, `value`
    * @param windowSec   attribution window (click within [imp_ts, imp_ts+w])
    * @param delay       watermark delay for out-of-order arrivals
    * @return one row per (impression, click) match: imp_id, click_id,
    *         user_id, imp_ts, click_ts, value */
  def clickAttribution(impressions: DataFrame, clicks: DataFrame,
                       windowSec: Long, delay: String = "60 seconds"): DataFrame = {
    require(windowSec > 0, s"windowSec must be positive: $windowSec")
    val i = impressions.select(
        col("event_id").as("imp_id"), col("user_id"),
        col("ts").cast("timestamp").as("imp_ts"))
      .withWatermark("imp_ts", delay)
    val c = clicks.select(
        col("event_id").as("click_id"), col("user_id").as("_cuser"),
        col("ts").cast("timestamp").as("click_ts"), col("value"))
      .withWatermark("click_ts", delay)
    i.join(c,
        i("user_id") === c("_cuser") &&
          c("click_ts") >= i("imp_ts") &&
          c("click_ts") <= i("imp_ts") + expr(s"INTERVAL $windowSec SECONDS"),
        "inner")
      .select(col("imp_id"), col("click_id"), col("user_id"),
        col("imp_ts"), col("click_ts"), col("value"))
  }
}
