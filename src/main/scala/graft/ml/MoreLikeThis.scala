package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse tf-idf "more like this": for each query document, the top-k most
  * similar OTHER documents by cosine over tf-idf term vectors — the
  * related-pages / nearest-duplicate-candidate op a search engine serves
  * next to every result, and the lexical twin of the dense-embedding ANN
  * tier ([[Ann]]). Works directly off the term postings (an inverted-index
  * shape), not an all-pairs comparison.
  *
  * Arithmetic (mirrored exactly by the q57 oracle SQL): tf = term count in
  * doc; idf = ln((N+1)/(df+1)) + 1 over distinct-doc df; w = tf·idf;
  * cosine = Σ_t w_q·w_d / (‖q‖·‖d‖) with both the dot product and the
  * squared norms folded in TERM order so the floating-point sum is
  * reproducible across partitionings.
  *
  * Scale shape: tf/df are map-side-combined aggregations over (doc, term);
  * terms with df > maxDfFrac·N are dropped (stopword pruning — the head
  * terms that would otherwise dominate the posting join's skew AND carry
  * near-zero idf anyway); the query-side vectors are a broadcast (bounded
  * by |queryIds| · vocabulary-per-doc), so candidate scoring is a narrow
  * broadcast join over the postings with one (query, candidate) aggregation
  * behind it. Nothing is O(n²) and no data-sized set reaches the driver.
  */
object MoreLikeThis {

  def topK(df: DataFrame, idCol: String, textCol: String, queryIds: Seq[Long],
           k: Int = 5, maxDfFrac: Double = 1.0): DataFrame = {
    require(queryIds.nonEmpty, "queryIds must be non-empty")
    require(k > 0, s"k must be positive, got $k")
    val spark = df.sparkSession
    import spark.implicits._

    val n = df.count()
    val tf = df
      .select(col(idCol).cast("long").as("doc_id"),
        explode(split(trim(col(textCol)), "\\s+")).as("term"))
      .filter($"term" =!= "")
      .groupBy($"doc_id", $"term")
      .agg(count(lit(1)).cast("double").as("tf"))
    val idf = tf.groupBy($"term")
      .agg(count(lit(1)).as("df")) // tf is one row per (doc, term)
      .filter($"df" <= lit(maxDfFrac * n))
      .select($"term", (log((lit(n) + lit(1.0)) / ($"df" + lit(1.0))) + lit(1.0)).as("idf"))
    val weights = tf.join(idf, Seq("term"))
      .select($"doc_id", $"term", ($"tf" * $"idf").as("w"))
    // ‖d‖: term-ordered fold of w² (reproducible FP sum), one row per doc
    val norms = weights
      .groupBy($"doc_id")
      .agg(sqrt(aggregate(sort_array(collect_list(struct($"term", ($"w" * $"w").as("w2")))),
        lit(0.0d), (acc, x) => acc + x.getField("w2"))).as("nrm"))
    val docVecs = weights.join(norms, Seq("doc_id"))

    val qVecs = broadcast(
      docVecs.filter($"doc_id".isin(queryIds: _*))
        .select($"doc_id".as("query_id"), $"term",
          $"w".as("qw"), $"nrm".as("qnrm")))

    val scored = docVecs.join(qVecs, Seq("term"))
      .filter($"doc_id" =!= $"query_id")
      .groupBy($"query_id", $"doc_id")
      .agg((aggregate(sort_array(collect_list(struct($"term", ($"qw" * $"w").as("p")))),
        lit(0.0d), (acc, x) => acc + x.getField("p")) /
        (first($"qnrm") * first($"nrm"))).as("score"))

    val wRank = Window.partitionBy($"query_id").orderBy($"score".desc, $"doc_id".asc)
    scored.withColumn("rank", row_number().over(wRank))
      .filter($"rank" <= k)
      .select($"query_id", $"rank", $"doc_id", $"score")
  }
}
