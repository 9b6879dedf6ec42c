package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Query-log burst detection — the "trending now" signal a search frontend
  * surfaces and the load-shedding/caching layer watches: a query is
  * bursting in an hour when its count exceeds `factor`× its trailing
  * `windowHours`-hour average AND clears an absolute floor (the floor
  * keeps 1→2-count noise out).
  *
  * INTEGER-EXACT by construction: the trailing average never materializes
  * as a float — the predicate is `cnt · windowHours > factor · prev_sum`
  * (with `prev_sum` the trailing-window count sum), so any engine replays
  * the verdicts bit-identically. A query's first active hour has
  * prev_sum = 0: any count ≥ `minCount` is a burst (the new-query spike).
  *
  * The trailing window is RANGE-based over the hour INDEX, not row-based —
  * silent hours (no log rows at all) correctly dilute the baseline of a
  * sparse query rather than being skipped.
  *
  * Scale shape: hourly counts are a map-side-combined agg (shuffle carries
  * (query, hour, cnt), never log rows); the range window partitions by
  * query — per-query hour series are small (hours, not events) and skew is
  * bounded by the calendar, not by traffic.
  */
object Trending {

  /** @param log columns `query` (STRING), `ts` (TIMESTAMP)
    * @return (query, hour, cnt, prev_sum, is_burst) — one row per ACTIVE
    *         (query, hour); `hour` is the epoch-hour index. */
  def bursts(log: DataFrame, windowHours: Int, factor: Int,
             minCount: Long): DataFrame = {
    require(windowHours >= 1, s"windowHours must be >= 1: $windowHours")
    require(factor >= 1, s"factor must be >= 1: $factor")
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    val counts = log
      .groupBy(col("query"),
        floor(col("ts").cast("long") / 3600L).cast("long").as("hour"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("query").orderBy(col("hour"))
      .rangeBetween(-windowHours, -1)
    counts
      .withColumn("prev_sum", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .withColumn("is_burst",
        col("cnt") * windowHours > col("prev_sum") * factor &&
          col("cnt") >= minCount)
  }
}
