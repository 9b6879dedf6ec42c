package graft.query

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.index.DictEntry

/** "Did you mean" spell correction against the index dictionary: for each
  * query term ABSENT from the dictionary, the closest dictionary term by
  * Levenshtein distance (≤ `maxDist`), ties broken by highest df then
  * term-asc — the standard misspelled-query recovery flow in front of the
  * scorers (a present term needs no suggestion and emits no row; so does a
  * hopeless term with no candidate in range).
  *
  * Scale shape: the probe side is the (tiny, driver-known) missing-term
  * set, broadcast over ONE scan of the dictionary with a codegen'd
  * `levenshtein` condition — cost is |dictionary| × |missing terms| narrow
  * work, no shuffle of the dictionary and nothing data-sized at the
  * driver. (A latency-serving deployment would precompute a
  * deletion-neighborhood index, SymSpell-style — this is the batch shape
  * that generates those candidates too.)
  */
object SpellCorrect {

  def didYouMean(dictionary: Dataset[DictEntry], terms: Seq[String],
                 maxDist: Int = 2): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val spark = dictionary.sparkSession
    import spark.implicits._
    val distinctTerms = terms.distinct
    if (distinctTerms.isEmpty)
      return spark.emptyDataFrame
        .withColumn("query_term", lit("")).withColumn("suggestion", lit(""))
        .withColumn("dist", lit(0)).withColumn("df", lit(0L)).limit(0)
    // present terms need no suggestion — resolved with one tiny filter so
    // their candidate scans never run
    val present = dictionary.filter($"term".isin(distinctTerms: _*))
      .select($"term").collect().map(_.getString(0)).toSet
    val missing = distinctTerms.filterNot(present)
    val probe = broadcast(missing.toDF("query_term"))
    val cand = dictionary.toDF()
      .join(probe, levenshtein($"term", $"query_term") <= maxDist)
      .select($"query_term", $"term".as("suggestion"),
        levenshtein($"term", $"query_term").as("dist"), $"df")
    val w = Window.partitionBy($"query_term")
      .orderBy($"dist".asc, $"df".desc, $"suggestion".asc)
    cand.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"query_term", $"suggestion", $"dist", $"df")
  }
}
