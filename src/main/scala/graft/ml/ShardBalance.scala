package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Size-balanced training-shard assignment — the data-loader side of
  * sequence packing: N documents with wildly skewed token counts must
  * split into S shards whose token totals are close enough that no
  * data-parallel worker starves. Deterministic round-robin by size rank
  * (the sorted variant of LPT scheduling): rows ranked by (weight desc,
  * id asc), shard = (rank−1) mod S — consecutive heavy rows land on
  * different shards, and the per-shard total is within one maximum item
  * of the mean for the classic adversarial inputs.
  *
  * Scale shape: the global size rank uses the SAME two-phase
  * range-partition prefix pattern as [[CorpusSelect]]/[[TextAnalysis.packSequences]]
  * (per-partition COUNTS to the driver, broadcast offsets) — never a
  * single-partition Window.orderBy. The assignment is a narrow map after
  * one range shuffle.
  */
object ShardBalance {

  /** Assign every row a shard in [0, shards). Returns
    * (idCol, weight, shard). */
  def assign(df: DataFrame, idCol: String, weight: Column,
             shards: Int, parts: Int = 0): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val spark = df.sparkSession
    import spark.implicits._
    val p = if (parts > 0) parts else spark.sparkContext.defaultParallelism
    val narrow = df.select(col(idCol).cast("long").as("id"),
        weight.cast("long").as("weight"))
      .repartitionByRange(p, col("weight").desc, col("id").asc)
      .sortWithinPartitions(col("weight").desc, col("id").asc)
      .withColumn("pid", spark_partition_id())
      .as[(Long, Long, Int)]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val partCounts = narrow.mapPartitions { it =>
      val acc = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
      var curPid = Int.MinValue; var n = 0L
      for ((_, _, pid) <- it) {
        if (pid != curPid) { if (curPid != Int.MinValue) acc += ((curPid, n)); curPid = pid; n = 0L }
        n += 1
      }
      if (curPid != Int.MinValue) acc += ((curPid, n))
      acc.iterator
    }.collect().sortBy(_._1)
    val offsets = {
      var acc = 0L
      partCounts.map { case (pid, n) => val o = acc; acc += n; pid -> o }.toMap
    }
    val ob = spark.sparkContext.broadcast(offsets)
    val result = narrow.mapPartitions { it =>
      var curPid = Int.MinValue
      var rank = 0L
      it.map { case (id, w, pid) =>
        if (pid != curPid) { curPid = pid; rank = ob.value.getOrElse(pid, 0L) }
        val shard = (rank % shards).toInt
        rank += 1
        (id, w, shard)
      }
    }.toDF(idCol, "weight", "shard")
      .localCheckpoint()
    narrow.unpersist()
    result
  }

  /** Per-shard load report: (shard, n_rows, total_weight). */
  def summary(assigned: DataFrame): DataFrame =
    assigned.groupBy("shard")
      .agg(count(lit(1)).as("n_rows"), sum(col("weight")).as("total_weight"))
}
