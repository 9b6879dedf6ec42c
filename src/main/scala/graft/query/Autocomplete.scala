package graft.query

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.index.DictEntry

/** Query autocomplete against the index dictionary: for each prefix, the
  * top-k completions ranked by document frequency (df desc, term asc on
  * ties) — the search-box suggestion source, fed by the same dictionary
  * the scorers read. A prefix with no completion emits no row.
  *
  * Scale shape: the probe side is the (tiny, user-typed) prefix set,
  * broadcast over ONE dictionary scan with a codegen'd `startswith`
  * condition; per-prefix top-k is a window over candidate rows only (a
  * prefix matches a vanishing fraction of a lexicon-bounded dictionary),
  * never a global sort. A latency-serving deployment would range-scan the
  * sorted term file in `DirectIndex` instead — this is the batch shape
  * that validates it. */
object Autocomplete {

  def complete(dictionary: Dataset[DictEntry], prefixes: Seq[String],
               k: Int = 5): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = dictionary.sparkSession
    import spark.implicits._
    val distinctPrefixes = prefixes.distinct.filter(_.nonEmpty)
    require(distinctPrefixes.nonEmpty, "need at least one non-empty prefix")
    val probe = broadcast(distinctPrefixes.toDF("prefix"))
    val cand = dictionary.toDF()
      .join(probe, $"term".startsWith($"prefix"))
    val w = Window.partitionBy($"prefix").orderBy($"df".desc, $"term".asc)
    cand.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"prefix", $"rank", $"term".as("completion"), $"df")
  }
}
