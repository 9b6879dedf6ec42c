package graft.tables

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout — the pre-paid shuffle. Writing a fact table
  * bucketed (and sorted) by its join key hashes every row into one of N
  * stable Murmur3 buckets at WRITE time; every later equi-join or
  * aggregation on that key between same-bucketed tables then runs with NO
  * exchange at all — at 100 TB that deletes the single largest cost of a
  * fact-to-fact join (shuffling both sides every query) in exchange for
  * one shuffle at ingest, amortized over every query that follows.
  *
  * This is the co-location story a Spark deployment uses where a
  * single-node engine would "just keep the hash table": the bucket
  * function is deterministic and recorded in the catalog, so the planner
  * PROVES both sides agree on partitioning and drops the Exchange nodes
  * (BucketingSpec pins that plan shape). The sortBy lets the sort-merge
  * join read each bucket file already ordered.
  */
object Bucketing {

  /** Writes `df` as a managed parquet table bucketed and sorted by
    * `keyCol` into `buckets` files per writer task's bucket set. */
  def writeBucketed(df: DataFrame, table: String, keyCol: String,
                    buckets: Int): Unit = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val spark = df.sparkSession
    // idempotent across SESSIONS, not just within one: the in-memory
    // catalog dies with the session but the warehouse location doesn't,
    // and saveAsTable refuses a fresh managed table over a stale dir.
    // The location is resolved through the catalog (not warehouse/name
    // by convention) so a non-default current database still cleans the
    // right directory.
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, keyCol).sortBy(keyCol)
      .saveAsTable(table)
  }

  /** Exchange-free equi-join of two tables bucketed on their join keys:
    * the `merge` hint pins sort-merge (a broadcast would hide whether
    * co-location worked), and matching bucket counts make both exchanges
    * provably unnecessary. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.hint("merge").join(r,
      l(leftKey) === r(rightKey))
  }
}
