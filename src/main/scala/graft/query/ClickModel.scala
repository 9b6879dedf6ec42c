package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Position-bias-corrected click attractiveness — the offline
  * search-quality op that turns a click log into relevance estimates.
  * Raw CTR punishes results that were shown low on the page; the
  * simplified position-based model (PBM with a KNOWN examination
  * probability per position) divides observed clicks by the examination
  * mass the result actually received:
  *
  *   â(q, u) = Σ clicks(q, u) / Σ bias(position shown)
  *
  * Scale shape: ONE map-side-combined groupBy over (qid, url) — the log
  * never joins anything; the bias is a closed-form column. Estimates are
  * engine-portable when `bias` is dyadic (defaults to (16 − p)/16): the
  * partial sums are then exact in binary at ANY aggregation order, so the
  * final division is bit-identical on any engine or parallelism.
  */
object ClickModel {

  /** Default examination probability: (16 − position)/16 — linearly
    * decaying, exactly representable (position 1..15). */
  def defaultBias: Column = (lit(16) - col("position")) / lit(16.0)

  /** (qid, url, impressions, clicks, attract) over a click log
    * (qid, url, position, clicked∈{0,1}); `attract` rounded to 6dp
    * half-even. Rows with fewer than `minImpressions` are dropped
    * (estimates off a handful of impressions are noise). */
  def attractiveness(log: DataFrame, bias: Column = defaultBias,
                     minImpressions: Long = 1L): DataFrame =
    log.groupBy("qid", "url")
      .agg(count(lit(1)).as("impressions"),
        sum(col("clicked").cast("long")).as("clicks"),
        sum(bias).as("exam_mass"))
      .where(col("impressions") >= minImpressions)
      .select(col("qid"), col("url"), col("impressions"), col("clicks"),
        (bround(col("clicks") / col("exam_mass") * 1e6, 0) / 1e6)
          .as("attract"))
}
