package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) shard→worker placement — the
  * assignment layer under [[ShardedSearch]]: which serving worker owns
  * which index shard, with R replicas. HRW's defining property is MINIMAL
  * RESHUFFLE: adding or removing one worker moves only the shards whose
  * top-R set that worker enters or leaves (~R/W of the total), where a
  * mod-W scheme would move nearly everything. No coordinator, no stored
  * ring — any node recomputes the same placement from the shard id and
  * the worker list alone.
  *
  * Scale shape: the worker list is tiny and literal, so the shard×worker
  * score matrix is a broadcast-joined narrow projection over the shard
  * table; the per-shard top-R is a window over W rows per shard. Scores
  * use the portable md5-based h60, so any engine (or the serving tier
  * itself, off-Spark) recomputes the identical placement.
  */
object ShardPlacement {

  /** (shard, worker, replica): for each shard in `shards(shardCol)`, the
    * `replicas` workers with the highest portable hash of
    * "shard|worker", replica numbered 1..R by (score desc, worker asc). */
  def assign(shards: DataFrame, shardCol: String, workers: Seq[String],
             replicas: Int): DataFrame = {
    require(workers.nonEmpty, "need at least one worker")
    require(workers.distinct.size == workers.size,
      s"duplicate worker names: $workers")
    require(replicas >= 1 && replicas <= workers.size,
      s"replicas ($replicas) must be in [1, ${workers.size}]")
    val spark = shards.sparkSession
    import spark.implicits._
    val w = workers.toDF("worker")
    val scored = shards.select(col(shardCol).cast("string").as("shard"))
      .crossJoin(broadcast(w))
      .withColumn("score",
        graft.ml.Sketches.h60(concat(col("shard"), lit("|"), col("worker"))))
    val rank = Window.partitionBy("shard")
      .orderBy(col("score").desc, col("worker").asc)
    scored.withColumn("replica", row_number().over(rank))
      .where(col("replica") <= replicas)
      .select("shard", "worker", "replica")
  }
}
