package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One closed user session. */
final case class SessionOut(user_id: Long, session_start: Timestamp,
                            session_end: Timestamp, n_events: Long, sum_value: Double)

/** Open-session state carried across streaming micro-batches. Timestamps
  * are ORIGINAL epoch MICROS (parquet event-time precision — batch emits
  * min/max of the raw event timestamps, so the streaming twin must not
  * truncate them); the gap rule itself compares floor-seconds, exactly
  * like the batch twin's `cast(ts as long)`. */
final case class SessionState(startUs: Long, endUs: Long, n: Long, sum: Double)

/** [[Sessionize.streamingWithTimeout]] state: the open session plus the
  * buffer of events still inside the out-of-orderness window (ts ≥
  * watermark — a later-arriving event may still precede them, so they are
  * not folded until the watermark passes). Events as (event_id,
  * epochMicros, value), kept SORTED by (ts, event_id): each invocation
  * merges the sorted incoming batch in O(buf + batch) and ripe events are
  * a prefix — no O(n log n) re-sort of the whole buffer per trigger.
  *
  * Practical state bound: buf holds one user's events younger than the
  * watermark delay D, i.e. ≤ that user's event rate × D rows — pick D
  * accordingly (a 10-events/s hot user at D = 10 min is 6k rows, well
  * inside a state-store row). The open session is O(1) regardless, and the
  * bound is ENFORCED: past `maxBufferedPerKey` the query fails loudly
  * instead of letting one adversarial key blow its state row. */
final case class SessionBufState(open: Option[SessionState],
                                 buf: List[(Long, Long, Double)])

/** Gap-based sessionization of the events stream — the canonical custom-
  * state streaming operator (builder-prompt §2.9: KeyValueGroupedDataset +
  * flatMapGroupsWithState), with a batch twin whose window-function plan is
  * ANSI-SQL-expressible (and DuckDB-oracle-checked as q37).
  *
  * A session = consecutive events of one user with gaps ≤ `gapSec`
  * (gaps measured on floor-second timestamps, both twins identically).
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

  private def tsOfMicros(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  private def emit(userId: Long, st: SessionState): SessionOut =
    SessionOut(userId, tsOfMicros(st.startUs), tsOfMicros(st.endUs), st.n,
      // same HALF_UP-on-exact-decimal rounding as Spark's round()
      BigDecimal(st.sum).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)

  /** Streaming sessionization: custom per-user state via
    * flatMapGroupsWithState, NoTimeout variant — a session closes only when
    * a LATER event of the same user proves the gap (deterministic for
    * bounded replays closed with sentinel events; production uses
    * [[streamingWithTimeout]], which also flushes idle sessions). */
  def streaming(events: DataFrame, gapSec: Long): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_id"), unix_micros(col("ts").cast("timestamp")).as("us"),
        col("user_id"), col("value"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[(Long, Long, Long, Double)], st: GroupState[SessionState]) =>
          foldEvents(uid, it.map(e => (e._1, e._2, e._4)), st, gapSec)
      }
  }

  /** PRODUCTION streaming sessionization: EventTimeTimeout + watermark, so
    * an idle user's trailing session flushes once the watermark passes
    * `session_end + gap` — no sentinel event needed (the round-2 gap: with
    * NoTimeout, idle users' last sessions were never emitted). Closed-
    * session output is identical to [[batch]] over the watermark-admitted
    * event set. `events` must carry an event-time column `ts`; `delay` is
    * the out-of-orderness bound.
    *
    * Out-of-order correctness: an event is folded into the session walk
    * only once the watermark passes it (no admissible event can precede it
    * anymore); newer events wait in [[SessionBufState]]'s buffer. Folding
    * eagerly instead would let a late-but-admitted event rewind an open
    * session's end and split/flush it with corrupt bounds.
    *
    * `maxBufferedPerKey` CAPS the per-user out-of-order buffer: state is
    * otherwise ∝ a user's event rate × the watermark delay, so one
    * adversarial user (a bot hammering events inside a long delay window)
    * could blow a single state-store row. On overflow the query FAILS
    * LOUDLY naming the user — the documented choice over flush-with-warning,
    * because an early flush silently corrupts that user's session bounds
    * (a later-but-admissible event could still precede the flushed ones);
    * the operator's remediation is a shorter delay or a larger cap. */
  def streamingWithTimeout(events: DataFrame, gapSec: Long,
                           delay: String = "0 seconds",
                           maxBufferedPerKey: Int = 1 << 20): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("event_time", col("ts").cast("timestamp"))
      .withWatermark("event_time", delay)
      // the WATERMARKED column itself must flow into the grouped Dataset
      // (Spark ties event-time timeout to a watermark attribute in the
      // child's output); event-time micros are taken from it inside the fold
      .select(col("event_id"), col("event_time"), col("user_id"), col("value"))
      .as[(Long, java.sql.Timestamp, Long, Double)]
      .groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[(Long, java.sql.Timestamp, Long, Double)],
         st: GroupState[SessionBufState]) =>
          val wmMs = st.getCurrentWatermarkMs()
          val prior = st.getOption.getOrElse(SessionBufState(None, Nil))
          val incoming = it.map(e =>
            (e._1, e._2.getTime * 1000L + (e._2.getNanos / 1000L) % 1000L, e._4))
            .toIndexedSeq.sortBy(e => (e._2, e._1))
          // merge the sorted batch into the sorted buffer (O(buf + batch));
          // RIPE events (ts strictly below the watermark) can no longer be
          // preceded by an admissible arrival and form a PREFIX of the
          // merged order — fold them; the rest stays buffered, still sorted
          val merged = {
            val b = IndexedSeq.newBuilder[(Long, Long, Double)]
            val ita = prior.buf.iterator.buffered
            val itb = incoming.iterator.buffered
            while (ita.hasNext && itb.hasNext) {
              val a = ita.head; val c = itb.head
              if (a._2 < c._2 || (a._2 == c._2 && a._1 <= c._1)) b += ita.next()
              else b += itb.next()
            }
            b ++= ita; b ++= itb
            b.result()
          }
          val (ripe, hold) = merged.span(e => e._2 / 1000L < wmMs)
          val out = IndexedSeq.newBuilder[SessionOut]
          var cur = prior.open.orNull
          for ((_, us, v) <- ripe) {
            val sec = Math.floorDiv(us, 1000000L)
            if (cur != null && sec - Math.floorDiv(cur.endUs, 1000000L) > gapSec) {
              out += emit(uid, cur)
              cur = null
            }
            cur =
              if (cur == null) SessionState(us, us, 1L, v)
              else cur.copy(endUs = us, n = cur.n + 1, sum = cur.sum + v)
          }
          // watermark flush: no admissible event (ts ≥ watermark) can merge
          // once floor-sec(watermark) exceeds session_end + gap — exactly
          // what a later event's gap would have proven
          if (cur != null &&
              Math.floorDiv(wmMs, 1000L) > Math.floorDiv(cur.endUs, 1000000L) + gapSec) {
            out += emit(uid, cur)
            cur = null
          }
          if (hold.length > maxBufferedPerKey)
            throw new IllegalStateException(
              s"user $uid holds ${hold.length} buffered out-of-order events " +
              s"(cap $maxBufferedPerKey) — one key's state row would grow unboundedly; " +
              "shorten the watermark delay or raise maxBufferedPerKey")
          if (cur == null && hold.isEmpty) st.remove()
          else {
            st.update(SessionBufState(Option(cur), hold.toList))
            // wake when the open session's flush deadline passes OR when the
            // earliest buffered event ripens, whichever first; must stay
            // above the current watermark or Spark rejects it
            val openDeadline =
              if (cur == null) Long.MaxValue
              else (Math.floorDiv(cur.endUs, 1000000L) + gapSec + 1L) * 1000L
            val bufDeadline =
              if (hold.isEmpty) Long.MaxValue
              else hold.map(_._2 / 1000L).min + 1L
            st.setTimeoutTimestamp(math.max(math.min(openDeadline, bufDeadline), wmMs + 1L))
          }
          out.result().iterator
      }
  }

  /** Shared per-group fold (events as (event_id, epochMicros, value)). */
  private def foldEvents(userId: Long, it: Iterator[(Long, Long, Double)],
                         state: GroupState[SessionState],
                         gapSec: Long): Iterator[SessionOut] = {
    val sorted = it.toIndexedSeq.sortBy(e => (e._2, e._1))
    var cur = state.getOption.orNull
    val out = IndexedSeq.newBuilder[SessionOut]
    for ((_, us, v) <- sorted) {
      val sec = Math.floorDiv(us, 1000000L)
      if (cur != null && sec - Math.floorDiv(cur.endUs, 1000000L) > gapSec) {
        out += emit(userId, cur)
        cur = null
      }
      cur =
        if (cur == null) SessionState(us, us, 1L, v)
        else cur.copy(endUs = us, n = cur.n + 1, sum = cur.sum + v)
    }
    if (cur != null) state.update(cur) else state.remove()
    out.result().iterator
  }
}
