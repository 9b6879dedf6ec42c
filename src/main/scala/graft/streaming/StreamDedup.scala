package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming exactly-once ingest dedup chained into a windowed rollup —
  * the fourth Structured Streaming state primitive the engine serves
  * (windowed aggregation → StreamIngest, keyed timeout state → Sessionize,
  * symmetric join state → StreamJoin, DEDUP STATE → here), and the first
  * chained-stateful pipeline (dedup feeding an aggregation in one query).
  *
  * A re-crawl or an at-least-once feed delivers the same event more than
  * once; `dropDuplicatesWithinWatermark` keeps one state row per id and
  * EVICTS it once the watermark passes the id's event time plus the delay
  * — unlike plain streaming `dropDuplicates`, whose id state grows forever
  * and dies at stream scale, not in a test. Eviction does NOT reopen a
  * double-count hole: once an id's state is evicted the watermark has
  * already passed its event time, so a redelivered copy is dropped as LATE
  * data. The trade is the standard watermark one — an event whose FIRST
  * copy arrives behind the watermark is lost — which is what bounds state
  * at 100 TB (feeds redeliver within bounded windows).
  *
  * The hourly rollup after the dedup is a second stateful operator in the
  * SAME query — Spark chains them because the dedup preserves the
  * watermark column, so the window state is also bounded and windows emit
  * (append mode) exactly once when the watermark passes their end.
  */
object StreamDedup {

  /** Deduped hourly event counts over an at-least-once stream.
    *
    * @param events streaming frame carrying `idCol`, `tsCol`, `value`
    * @param idCol  the exactly-once identity (e.g. `event_id`)
    * @param tsCol  event-time column (cast to TIMESTAMP internally)
    * @param delay  watermark delay = max tolerated out-of-orderness AND
    *               the redelivery window within which dedup is guaranteed
    * @return one row per non-empty hour: `hour`, `cnt`, `sum_value`
    *
    * A bounded replay flushes its final windows with a far-future
    * HEARTBEAT row processed last: it advances the watermark past every
    * real window's end, while its own window can never emit (the
    * watermark never passes the window holding the max event time), so it
    * leaves no trace in the append output. Do NOT try to filter the
    * heartbeat out instead: a predicate on a non-event-time column is
    * pushed below the watermark node into the scan, and the heartbeat
    * then never advances anything. */
  def dedupedHourlyCounts(events: DataFrame, idCol: String, tsCol: String,
                          delay: String): DataFrame =
    events
      .withColumn(tsCol, col(tsCol).cast("timestamp"))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(idCol)
      .groupBy(window(col(tsCol), "1 hour"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour"), col("cnt"), col("sum_value"))
}
