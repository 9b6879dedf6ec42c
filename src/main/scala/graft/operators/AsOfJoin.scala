package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of") join: for every left row, attach the single most
  * recent right row with `right.ts <= left.ts` for the same key (or nulls if
  * no right row precedes it).
  *
  * The classic use in this engine's domain is point-in-time feature lookup
  * over an event log — "the last page view before each purchase", "the crawl
  * snapshot in force when a query arrived" — where a plain equi-join is
  * wrong (it matches ALL prior rows) and an inequality join is ruinous
  * (Catalyst executes `l.ts >= r.ts` as a broadcast-nested-loop or an
  * O(n·m) range scan per key).
  *
  * Spark-first plan — union + ordered window scan, NOT an inequality join:
  * tag the two inputs, union them, and run ONE window pass per key ordered
  * by (ts, side, tieBreak) that carries the latest right payload forward
  * with `last(_, ignoreNulls = true)`. Cost at any scale is one shuffle on
  * the key plus a per-partition sort — linear, no candidate explosion, and
  * the carried state per task is a single struct. This is the standard
  * distributed as-of shape (kdb's `aj` / Flink temporal join re-expressed
  * declaratively); at 10^12 rows it range-partitions by key like any other
  * window, and AQE splits skewed keys' sorts, not a quadratic join.
  *
  * Semantics pinned for determinism:
  *  - inclusive: a right row at exactly `left.ts` matches (right rows sort
  *    BEFORE left rows at equal ts);
  *  - ties among right rows at the same (key, ts) resolve to the LARGEST
  *    `tieBreak` value (its last-in-order row wins the `last()`).
  *
  * Right payload columns are returned under `prefix` (default `asof_`); the
  * caller's left columns pass through verbatim.
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String, tieBreak: String,
           prefix: String = "asof_"): DataFrame = {
    val rightPayload = right.columns.filterNot(_ == key).toSeq
    val clash = left.columns.toSet.intersect(rightPayload.map(prefix + _).toSet)
    require(clash.isEmpty,
      s"asOf: prefixed right columns collide with left columns: $clash")

    // a NULL right timestamp satisfies no `ts <= t` predicate — drop it
    // here (nulls-first ordering would otherwise make it "earlier than
    // everything" and matchable); a NULL LEFT timestamp sorts before every
    // right row and correctly matches nothing
    val rPrep = right.filter(col(rightTs).isNotNull).select(
      col(key).as("_k"), col(rightTs).as("_ts"), lit(0).as("_side"),
      col(tieBreak).as("_tie"),
      struct(rightPayload.map(col): _*).as("_r"))
    val lPrep = left.select(
      col(key).as("_k"), col(leftTs).as("_ts"), lit(1).as("_side"),
      lit(null).cast(rPrep.schema("_tie").dataType).as("_tie"),
      struct(left.columns.toSeq.map(col): _*).as("_l"))
    val unioned =
      lPrep.withColumn("_r", lit(null).cast(rPrep.schema("_r").dataType))
        .unionByName(rPrep.withColumn("_l",
          lit(null).cast(lPrep.schema("_l").dataType)))

    // ROWS frame (not the default RANGE) so equal-sort-key peers cannot see
    // each other's payload; the (ts, side, tie) order makes the scan
    // deterministic under any partitioning.
    val w = Window.partitionBy("_k")
      .orderBy(col("_ts").asc, col("_side").asc, col("_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)

    val out =
      left.columns.toSeq.map(c => col("_l").getField(c).as(c)) ++
        rightPayload.map(c => col("_match").getField(c).as(prefix + c))
    matched.select(out: _*)
  }
}
