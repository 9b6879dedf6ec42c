package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Query-reformulation mining over a search-session log — the offline
  * analysis that feeds "did you mean" / related-searches from behavior
  * instead of the dictionary ([[SpellCorrect]] is the edit-distance twin).
  * A reformulation is two DIFFERENT queries issued consecutively by the
  * same user within `gapSec`: the user said the first answer wasn't it.
  *
  * Scale shape: ONE shuffle on user_id for the lag window (the same key a
  * session log is naturally bucketed by), then a map-side-combined count
  * per (prev, next) pair; top-k is TakeOrdered, never a global sort. At
  * 10¹² log rows nothing here is quadratic and nothing transits the
  * driver but the k result rows.
  */
object Reformulations {

  /** Mine `log` (user, ts, query) for the top-k reformulation pairs:
    * consecutive same-user queries with 0 < gap ≤ gapSec and
    * prev ≠ next, counted, kept at count ≥ minCount, ranked by
    * (count desc, prev asc, next asc). */
  def mine(log: DataFrame, gapSec: Long, minCount: Long, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user").orderBy(col("ts").asc)
    log
      .withColumn("prev", lag(col("query"), 1).over(byUser))
      .withColumn("gap",
        col("ts").cast("long") - lag(col("ts").cast("long"), 1).over(byUser))
      .where(col("prev").isNotNull && col("prev") =!= col("query") &&
        col("gap") > 0 && col("gap") <= gapSec)
      .groupBy(col("prev"), col("query").as("next"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("prev").asc, col("next").asc)
      .limit(k)
  }
}
