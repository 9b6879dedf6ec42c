package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted sampling WITHOUT replacement as one distributed top-k
  * (Efraimidis & Spirakis 2006, algorithm A-ES): every row draws a
  * deterministic pseudo-uniform u ∈ (0,1) from the portable 60-bit md5
  * hash of its id (plus a seed tag) and is ranked by `key = ln(u) / w`;
  * the k LARGEST keys are an exact weighted sample without replacement.
  *
  * Complements the engine's other samplers: q34's Bernoulli coin is
  * per-row independent (unweighted, no fixed size), q49 stratifies by
  * quality rank, q64 resamples to target mixture rates — this one draws a
  * FIXED-SIZE sample where inclusion probability follows a per-row weight
  * (e.g. sample 10^7 training docs ∝ length or quality from 10^12).
  *
  * Scale shape: the key is a narrow codegen'd projection; selection is
  * `TakeOrderedAndProject` (per-partition heaps + driver merge of k rows),
  * never a global sort — and the hash-derived u makes the draw reproducible
  * across runs, partitionings, and engines (the DuckDB oracle re-derives
  * it exactly).
  *
  * Rows with non-positive weight are excluded (A-ES requires w > 0).
  */
object WeightedSample {

  def topK(df: DataFrame, idCol: String, weightCol: String, k: Int,
           seed: String): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(seed.forall(c => c.isLetterOrDigit || c == '_' || c == '-'),
      s"seed must be alphanumeric (it is inlined into a SQL expression): $seed")
    val h = expr(
      s"conv(substr(md5(concat(cast(`$idCol` as string), '$seed')), 1, 15), 16, 10)")
      .cast("long")
    // u over 2^50 distinct values: big enough that the k-th-key boundary
    // bucket is a singleton w.h.p. even at 10^12 rows (a coarse u would
    // make the boundary an exact-key TIE resolved by id — a deterministic
    // low-id bias), small enough that the integer arithmetic stays exact
    // in a double on every engine (2^50 + 2 < 2^53)
    val u = (h % 1125899906842624L + 1).cast("double") / lit(1125899906842626.0)
    df.filter(col(weightCol) > 0)
      .withColumn("samp_key", log(u) / col(weightCol).cast("double"))
      .orderBy(col("samp_key").desc, col(idCol).asc)
      .limit(k)
  }
}
