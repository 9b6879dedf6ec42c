package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-sequence conversion funnel — the event-analytics op a search
  * property runs over its behavior log (view → click → purchase…): a user
  * reaches stage k at their EARLIEST stage-k event strictly after their
  * stage-(k−1) reach time (the sequential semantics real funnel engines
  * implement — out-of-order events don't count, repeat visits don't
  * double-count). Output is one row per stage with the user count and
  * conversion from stage 1.
  *
  * Deterministic: reach times are mins of exact parquet timestamps,
  * stage counts are integers, conversion is one division rounded 6dp.
  *
  * Scale shape: K−1 user-keyed join+agg passes (K = stage count, a small
  * constant) — every shuffle is on the user key the log is naturally
  * bucketed by, map-side-combined mins; the driver sees K counts. At
  * 10¹² events nothing here is quadratic or driver-sized.
  */
object Funnel {

  /** @return (stage_idx, stage, users, conversion) ordered by stage. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.size >= 2, s"need at least 2 stages: $stages")
    require(stages.distinct.size == stages.size, s"duplicate stages: $stages")
    val spark = events.sparkSession
    import spark.implicits._

    var reached = events.where(col(typeCol) === stages.head)
      .groupBy(col(userCol).as("u")).agg(min(col(tsCol)).as("t"))
      .persist()
    val counts = scala.collection.mutable.ArrayBuffer(
      (1, stages.head, reached.count()))
    for ((stage, i) <- stages.tail.zipWithIndex) {
      val prev = reached
      reached = events.where(col(typeCol) === stage)
        .select(col(userCol).as("u"), col(tsCol).as("ts2"))
        .join(prev, Seq("u"))
        .where(col("ts2") > col("t"))
        .groupBy(col("u")).agg(min(col("ts2")).as("t"))
        .persist()
      counts += ((i + 2, stage, reached.count()))
      prev.unpersist()
    }
    reached.unpersist()

    val base = counts.head._3
    spark.createDataset(counts.toSeq.map { case (idx, stage, users) =>
      (idx, stage, users,
        if (base > 0) Some(math.rint(users.toDouble / base.toDouble * 1e6) / 1e6)
        else None)
    }).toDF("stage_idx", "stage", "users", "conversion")
  }
}
