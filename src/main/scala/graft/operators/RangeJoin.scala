package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (band) join — the range join Spark has no built-in
  * operator for. Naively `p BETWEEN s AND e` is a non-equi condition, so
  * Catalyst plans BroadcastNestedLoopJoin (fact × every interval — dies
  * once the interval side outgrows a broadcast) or a cartesian product.
  *
  * Bucketization turns it into an equi-join: pick a bucket width `w`, map
  * each point to bucket floor(p/w), explode each interval [s,e] to its
  * covering buckets floor(s/w)..floor(e/w), equi-join on the bucket, then
  * apply the exact containment filter as a residual. Every true
  * (point, interval) match surfaces EXACTLY once — the point lives in one
  * bucket and the interval covers that bucket once — so no dedup pass, and
  * floor(x/w) is monotone so an interval's bucket range always covers its
  * points' buckets regardless of double rounding.
  *
  * Scale: shuffle is O(points + intervals × buckets-per-interval), group
  * sizes bounded by bucket population, never |points|×|intervals|. Pick
  * `w` near the typical interval length so intervals explode to ~2-3
  * buckets; a `w` far below that multiplies the interval side, a `w` far
  * above it funnels many intervals into each bucket (toward the nested-
  * loop cost inside one task). Skewed bucket population (all points in one
  * time slice) composes with SaltedJoin the usual way.
  */
object RangeJoin {

  /** Inner join of `points` rows to every `intervals` row whose
    * [startCol, endCol] (both inclusive) contains the point. All columns
    * of both inputs are kept; names must not collide.
    *
    * @param bucketWidth bucket size in the units of pointCol; > 0 */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val pb = points.withColumn("_bucket",
      floor(col(pointCol) / bucketWidth))
    val ib = intervals.withColumn("_bucket",
      explode(sequence(floor(col(startCol) / bucketWidth),
        floor(col(endCol) / bucketWidth))))
    pb.join(ib, Seq("_bucket"))
      .filter(col(pointCol) >= col(startCol) &&
        col(pointCol) <= col(endCol))
      .drop("_bucket")
  }
}
