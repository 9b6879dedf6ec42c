package graft.tables

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style column profiling: per column, exact row / null / distinct
  * counts — the stats pass a table layout runs before query planning (CBO
  * inputs, data-quality dashboards, schema drift alarms).
  *
  * Scale shape: ONE pass over the data. Multiple exact `countDistinct`s in
  * one agg plan through Spark's Expand (row multiplication ×|cols| before
  * the partial agg — the standard exact-stats cost; a 100 TB deployment
  * that can tolerate error would swap `approx_count_distinct` per column,
  * same single-pass shape, no expansion). Only the |cols|-sized stat row
  * reaches the driver. */
object TableProfile {

  /** One (col_name, n_rows, n_nulls, n_distinct) row per profiled column,
    * col_name-ordered. `countDistinct` ignores nulls (SQL semantics). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val spark = df.sparkSession
    import spark.implicits._
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"),
        countDistinct(col(c)).as(s"dist_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val nRows = row.getLong(0)
    cols.sorted.map { c =>
      (c, nRows, row.getLong(row.fieldIndex(s"nulls_$c")),
        row.getLong(row.fieldIndex(s"dist_$c")))
    }.toDF("col_name", "n_rows", "n_nulls", "n_distinct")
  }

  /** Equi-width histogram of a numeric column: `bins` buckets spanning
    * [min, max], one (bin, n_rows, bin_min, bin_max) row per NON-EMPTY
    * bucket. NULLs are excluded (they have no bin).
    *
    * Two tiny passes: a 1-row min/max agg broadcast back onto the scan,
    * then a map-side-combined count per bin — no sort, no window, and the
    * bin expression `least(floor((v-mn)/width), bins-1)` is plain IEEE
    * arithmetic an independent engine reproduces exactly. A constant
    * column (mn == mx) degenerates to one bin 0. */
  def histogram(df: DataFrame, column: String, bins: Int): DataFrame = {
    require(bins > 0, s"bins must be positive: $bins")
    val v = col(column).cast("double")
    val mm = df.agg(min(v).as("_mn"), max(v).as("_mx"))
    df.filter(col(column).isNotNull)
      .crossJoin(broadcast(mm))
      .withColumn("bin",
        when(col("_mx") === col("_mn"), lit(0)).otherwise(
          least(floor((v - col("_mn")) /
            ((col("_mx") - col("_mn")) / bins)), lit(bins - 1)))
          .cast("int"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_rows"),
        min(v).as("bin_min"), max(v).as("bin_max"))
  }
}
