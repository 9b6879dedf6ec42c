package graft.util

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Generic two-phase distributed global rank — the scale-safe replacement
  * for `Window.orderBy` without a partition key (which Spark plans as ONE
  * task holding the whole input). Phase 1 range-partitions by the sort
  * key and counts rows per partition (one tiny row per partition to the
  * driver); phase 2 broadcasts the prefix offsets and assigns ranks in a
  * narrow map. The same shape [[graft.ml.ShardBalance]],
  * [[graft.ml.CorpusSelect]] and `TextAnalysis.packSequences` use for
  * their weighted prefix sums, factored out for the row-rank case.
  *
  * The `sort` columns MUST form a total order (include a unique
  * tiebreaker): ranks within a run of equal keys would otherwise depend
  * on which range partition the sampler sent them to.
  */
object GlobalRank {

  /** Append a 0-based global `rankCol` to `df` ordered by `sort`.
    * One range shuffle + one per-partition count job; the driver sees
    * only partition counts, never rows. */
  def zipWithRank(df: DataFrame, sort: Seq[Column], rankCol: String = "rank",
                  parts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(!df.columns.contains(rankCol), s"column $rankCol already exists")
    val p = if (parts > 0) parts else spark.sparkContext.defaultParallelism
    val sorted = df
      .repartitionByRange(p, sort: _*)
      .sortWithinPartitions(sort: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val counts = sorted.groupBy(col("__pid"))
      .agg(count(lit(1)).as("n"))
      .as[(Int, Long)].collect().sortBy(_._1)
    val offsets = {
      var acc = 0L
      counts.map { case (pid, n) => val o = acc; acc += n; pid -> o }.toMap
    }
    val ob = spark.sparkContext.broadcast(offsets)
    val outSchema = sorted.schema.add(rankCol,
      org.apache.spark.sql.types.LongType, nullable = false)
    val pidIdx = sorted.schema.fieldIndex("__pid")
    val ranked = sorted.mapPartitions { it =>
      var cur = Int.MinValue; var r = 0L
      it.map { row =>
        val pid = row.getInt(pidIdx)
        if (pid != cur) { cur = pid; r = ob.value.getOrElse(pid, 0L) }
        val out = Row.fromSeq(row.toSeq :+ r)
        r += 1
        out
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
      .drop("__pid")
      // pin the assignment: downstream jobs must not re-run the rank map
      // against a re-sampled range partitioning
      .localCheckpoint()
    sorted.unpersist()
    ranked
  }
}
