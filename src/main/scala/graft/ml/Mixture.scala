package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-mixing resampler: downsample each stratum (source/domain) to a
  * target mixture weight — the "data mixing" pass that turns a raw crawl
  * into a training mixture (e.g. 30% web, 30% books, ...).
  *
  * Selection is a deterministic per-document coin: keep when
  * `h60(id) mod 10^6 < floor(rate · 10^6)` with `rate = w·total/count`,
  * capped at 1 — so the kept set is stable across runs, partitionings and
  * cluster sizes, and any subset's membership can be re-derived row-locally
  * (the property Bernoulli `sample()` lacks). Hash and arithmetic use the
  * SQL-portable [[PortableHash]] recipe so an ANSI oracle reproduces the
  * exact kept set.
  *
  * Scale shape: ONE map-side-combined count agg over (stratum) — output is
  * |strata| rows, broadcast back — then a narrow codegen'd filter. Document
  * text never shuffles; there is no window, no global sort, no skew cliff
  * (a giant stratum costs the same scan as a small one).
  */
object Mixture {

  def resample(df: DataFrame, idCol: String, strataCol: String,
               weights: Map[String, Double], total: Long): DataFrame = {
    require(total > 0, s"total budget must be positive, got $total")
    require(weights.values.forall(w => w >= 0.0 && !w.isNaN),
      "mixture weights must be non-negative")
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.groupBy(col(strataCol).as("stratum"))
      .agg(count(lit(1)).as("cnt"))
    val wDf = weights.toSeq.toDF("stratum", "w")
    // strata with no assigned weight drop out of the mixture (inner join)
    val rates = counts.join(wDf, Seq("stratum"))
      .select(col("stratum"),
        least(lit(1.0), col("w") * total / col("cnt")).as("rate"))
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    df.join(broadcast(rates), df(strataCol) === col("stratum"))
      .filter(h % 1000000L < floor(col("rate") * 1000000.0).cast("long"))
      .select(col(idCol).cast("long").as("doc_id"),
        col("stratum").as("source"))
  }
}
