package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag corpus documents that share any n-token
  * run with an evaluation/benchmark document set — the GPT-3/PaLM-style
  * 13-gram overlap rule a training pipeline runs before a corpus ships, so
  * eval answers are not memorized from training text.
  *
  * Scale shape: the benchmark side is bounded (eval suites are thousands of
  * documents → at most a few million n-grams), so its distinct gram set is
  * BROADCAST; corpus n-grams are a narrow codegen'd projection that is
  * filtered by the broadcast hash join before anything shuffles — only the
  * (doc_id, matched-gram) hit rows (rare by construction) shuffle into the
  * per-document count. Corpus text itself never shuffles and there is no
  * driver-side set of corpus size.
  */
object Decontaminate {

  /** Sliding word n-grams of `text` (lowercased, whitespace-tokenized) as an
    * array column; empty array below n tokens. Narrow codegen'd expression. */
  private[ml] def wordGrams(text: Column, n: Int): Column = {
    val toks = filter(split(lower(trim(text)), "\\s+"), t => t =!= lit(""))
    val cnt = size(toks)
    when(cnt < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), cnt - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
  }

  /** One row per corpus document: `n_hit_grams` = distinct benchmark n-grams
    * the document contains, `contaminated` = 1 when any overlap exists. */
  def flag(corpus: DataFrame, idCol: String, textCol: String,
           benchmark: DataFrame, benchTextCol: String, n: Int = 13): DataFrame = {
    require(n >= 1, s"n-gram order must be >= 1, got $n")
    val benchGrams = benchmark
      .select(explode(wordGrams(col(benchTextCol), n)).as("gram"))
      .distinct()
    val corpusGrams = corpus
      .select(col(idCol).cast("long").as("doc_id"),
        explode(wordGrams(col(textCol), n)).as("gram"))
    val hits = corpusGrams
      .join(broadcast(benchGrams), Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gram")).as("n_hit_grams"))
    corpus.select(col(idCol).cast("long").as("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hit_grams"), lit(0L)).as("n_hit_grams"),
        col("n_hit_grams").isNotNull.cast("int").as("contaminated"))
  }
}
