package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Statistical-LM quality scoring (the CCNet/RedPajama "perplexity filter"):
  * train an add-one-smoothed bigram model on the corpus itself and score
  * every document by its average negative log-likelihood in nats per bigram
  * — templated/garbled text scores high, fluent prose scores low, and the
  * score feeds the same stratified sampling q49 runs.
  *
  * Numeric determinism: each bigram's `ln((c12+1)/(c1+V))` is a pure
  * double expression both engines evaluate identically (exact integer
  * counts < 2^53 promoted once); the per-document SUM is folded in token
  * position order (array_sort + aggregate ≡ DuckDB `list_reduce(list(
  * ... ORDER BY pos))`), never in shuffle-arrival order.
  *
  * Scale shape: token pairs are a narrow codegen'd projection (no
  * self-join); model "training" is two map-side-combined count aggs; the
  * score join shuffles (w1,w2)-keyed pair rows against the count tables —
  * head-term skew there is AQE skew-join territory and the joined payload
  * is (doc_id, pos, counts), never text. V (vocab size) is ONE scalar to
  * the driver. */
object LmScore {

  def bigramNll(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toksCol = filter(split(lower(trim(col(textCol))), "\\s+"),
      t => t =!= lit(""))
    val base = df.select(col(idCol).cast("long").as("doc_id"), toksCol.as("l"))
    val tok = base.select(col("doc_id"), explode(col("l")).as("w"))
    val uni = tok.groupBy(col("w").as("w1")).agg(count(lit(1)).as("c1"))
    val vocab = uni.count() // ONE scalar (distinct-token count) to the driver
    val bg = base
      .filter(size(col("l")) >= 2)
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), size(col("l")) - 2),
        i => struct(i.cast("int").as("pos"),
          element_at(col("l"), i + 1).as("w1"),
          element_at(col("l"), i + 2).as("w2")))).as("p"))
      .select(col("doc_id"), col("p.pos").as("pos"),
        col("p.w1").as("w1"), col("p.w2").as("w2"))
    val bc = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val scored = bg
      .join(bc, Seq("w1", "w2"))
      .join(uni, Seq("w1"))
      .select(col("doc_id"), col("pos"),
        log((col("c12") + lit(1.0)) / (col("c1") + lit(vocab))).as("logp"))
    val agg0 = scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        aggregate(transform(
          array_sort(collect_list(struct(col("pos"), col("logp")))),
          x => x.getField("logp")), lit(0.0), (a, x) => a + x).as("s"))
    df.select(col(idCol).cast("long").as("doc_id"))
      .join(agg0, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(round(-col("s") / col("n_bigrams"), 4), lit(0.0)).as("nll"))
  }
}
