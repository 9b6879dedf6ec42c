package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One closed user session. */
final case class SessionOut(user_id: Long, session_start: Timestamp,
                            session_end: Timestamp, n_events: Long, sum_value: Double)

/** Open-session state carried across streaming micro-batches. */
final case class SessionState(start: Long, end: Long, n: Long, sum: Double)

/** Gap-based sessionization of the events stream — the canonical custom-
  * state streaming operator (builder-prompt §2.9: KeyValueGroupedDataset +
  * flatMapGroupsWithState), with a batch twin whose window-function plan is
  * ANSI-SQL-expressible (and DuckDB-oracle-checked as q37).
  *
  * A session = consecutive events of one user with gaps ≤ `gapSec`.
  *
  * Scale shape: batch is one hash shuffle on user_id + an in-partition
  * window walk (no driver collection); streaming keeps ONE small state row
  * per open session, so state size ∝ active users, not events.
  */
object Sessionize {

  /** Batch sessionization via gaps-and-islands window functions.
    * Output: one row per session. Timestamps cast through TIMESTAMP so the
    * epoch math is well-defined on TimestampNTZ inputs under UTC. */
  def batch(events: DataFrame, gapSec: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val cum = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("sec", col("ts").cast("timestamp").cast("long"))
      .withColumn("prev_sec", lag(col("sec"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_sec").isNull || col("sec") - col("prev_sec") > gapSec, 1L)
          .otherwise(0L))
      .withColumn("sess_no", sum(col("new_sess")).over(cum))
      .groupBy(col("user_id"), col("sess_no"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .drop("sess_no")
  }

  /** Streaming sessionization: custom per-user state via
    * flatMapGroupsWithState. Emits a session when a gap closes it; the
    * open session rides in the state store across micro-batches (resuming
    * from the checkpoint on restart). Events inside a micro-batch arrive
    * unordered → sorted per group before folding.
    *
    * Uses NoTimeout: a session closes when a later event proves the gap.
    * (An EventTimeTimeout variant would also flush idle sessions once the
    * watermark passes start+gap; the test closes trailing sessions with a
    * sentinel event instead, which keeps the output deterministic for a
    * bounded replay.) */
  def streaming(events: DataFrame, gapSec: Long): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._

    def fold(userId: Long, it: Iterator[(Long, Long, Double)],
             state: GroupState[SessionState]): Iterator[SessionOut] = {
      val sorted = it.toIndexedSeq.sortBy(e => (e._2, e._1)) // (event_id, sec, value)
      var cur = state.getOption.orNull
      val out = IndexedSeq.newBuilder[SessionOut]
      for ((_, sec, v) <- sorted) {
        if (cur == null) cur = SessionState(sec, sec, 0L, 0.0)
        else if (sec - cur.end > gapSec) {
          out += SessionOut(userId, new Timestamp(cur.start * 1000L),
            new Timestamp(cur.end * 1000L), cur.n,
            // same HALF_UP-on-exact-decimal rounding as Spark's round()
            BigDecimal(cur.sum).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
          cur = SessionState(sec, sec, 0L, 0.0)
        }
        cur = cur.copy(end = sec, n = cur.n + 1, sum = cur.sum + v)
      }
      if (cur != null) state.update(cur) else state.remove()
      out.result().iterator
    }

    events
      .select(col("event_id"), col("ts").cast("timestamp").cast("long").as("sec"),
        col("user_id"), col("value"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[(Long, Long, Long, Double)], st: GroupState[SessionState]) =>
          fold(uid, it.map(e => (e._1, e._2, e._4)), st)
      }
  }
}
