package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weekly retention cohorts — the other staple event-analytics readout:
  * users are cohorted by the epoch-week of their FIRST event, and each
  * (cohort, week-offset) cell counts the cohort's users active that week,
  * as a fraction of the cohort. Funnel (q151) measures depth within a
  * session-ish sequence; this measures return behavior across weeks.
  *
  * Deterministic: the week index is INTEGER division of the epoch-second
  * (`div 604800` ↔ DuckDB `//`) — no float time arithmetic, no timezone
  * extraction (pure epoch math); counts are integers; the retention
  * fraction is one division rounded 6dp.
  *
  * Scale shape: distinct (user, week) first (the narrowest possible
  * shuffle), then one user-keyed min and one (cohort, offset) count —
  * all map-side-combined; output is cohorts × offsets rows, independent
  * of log size.
  */
object Retention {

  /** @return (cohort_week, week_offset, users, retention) ordered. */
  def weekly(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    // unix_micros over a cast absorbs TIMESTAMP_NTZ inputs (interpreted in
    // the session timezone — UTC under the driver contract), then pure
    // integer FLOOR division: 604800000000 µs per epoch week. Spark `div`
    // truncates toward zero while the oracle's DuckDB `//` floors — they
    // agree on nonnegative epochs but diverge on pre-1970 timestamps
    // (ADVICE r5), so the floor is built explicitly from div + a negative-
    // remainder adjustment (identical on all nonnegative inputs).
    val weeks = events.select(col(userCol).as("u"),
        expr(s"""(unix_micros(cast($tsCol as timestamp)) div 604800000000)
                 - (case when unix_micros(cast($tsCol as timestamp)) % 604800000000 < 0
                    then 1 else 0 end)""")
          .as("week"))
      .distinct()
    val firsts = weeks.groupBy(col("u")).agg(min(col("week")).as("cohort"))
    val sizes = firsts.groupBy(col("cohort"))
      .agg(count(lit(1)).cast("long").as("size"))
    weeks.join(firsts, Seq("u"))
      .groupBy(col("cohort"), (col("week") - col("cohort")).as("week_offset"))
      .agg(count(lit(1)).cast("long").as("users")) // (user, week) is distinct
      .join(sizes, Seq("cohort"))
      .select(col("cohort").as("cohort_week"), col("week_offset"),
        col("users"),
        (bround(col("users").cast("double") / col("size").cast("double") * 1e6,
          0) / 1e6).as("retention"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }
}
