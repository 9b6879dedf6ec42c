package graft.tables

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional file pruning — the
  * `OPTIMIZE ... ZORDER BY` analog for this engine's parquet tables.
  *
  * A table range-partitioned and sorted on ONE column prunes scans on that
  * column only: filter on any other column and every file matches. Sorting
  * instead on the bit-interleaved Z-key of two columns makes each file own
  * a compact Z-range, which is a compact rectangle neighborhood in (x, y)
  * space — so parquet footer min/max stats prune files for predicates on
  * EITHER dimension. At 100 TB that is the difference between "query by
  * user prunes, query by time scans everything" and both pruning; the
  * trade is that each single dimension prunes ~√files instead of the one
  * blessed dimension pruning to 1 file.
  *
  * The key is a pure codegen-friendly column expression (shifts and masks,
  * no UDF), so it whole-stage-compiles into the write pipeline.
  */
object ZOrder {

  /** 2-D Morton key: interleaves the low `bits` bits of two non-negative
    * integer columns — x on even bit positions, y on odd. Total key width
    * 2·bits ≤ 62 so the key stays a positive long. */
  def zKey(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31]: $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Writes `df` as `numFiles` parquet files clustered by the Z-key of
    * (`xCol`, `yCol`). Range partition + in-partition sort = globally
    * Z-sorted layout; the key itself is not persisted (footer min/max on
    * the original columns is what the reader prunes with). */
  def writeZOrdered(df: DataFrame, dir: String, xCol: String, yCol: String,
                    bits: Int = 16, numFiles: Int = 64): Unit =
    df.withColumn("_zkey", zKey(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("_zkey"))
      .sortWithinPartitions("_zkey")
      .drop("_zkey")
      .write.mode("overwrite").parquet(dir)
}
