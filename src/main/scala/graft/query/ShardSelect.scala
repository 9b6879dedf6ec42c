package graft.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CORI resource selection (Callan, Lu, Croft, SIGIR 1995) — the
  * federated-search layer above [[ShardedSearch]]/[[ShardPlacement]]:
  * rank index SHARDS by how likely they are to hold answers for a query,
  * then search only the top R. At 10⁴ topical shards this is the
  * difference between touching every machine per query and touching a
  * handful.
  *
  * Per query term t and shard c (df = docs in c containing t, cw = words
  * in c, C = shard count, cf = shards containing t):
  *
  *   T = df / (df + 50 + 150·cw/avgcw)
  *   I = ln((C + 0.5)/cf) / ln(C + 1)
  *   belief(t,c) = b + (1−b)·T·I        (belief = b where df = 0)
  *   score(q,c)  = mean over q's distinct terms
  *
  * Determinism contract: per-(query, shard) beliefs fold in TERM order
  * (sorted collect_list + aggregate) and the mean divides once at the
  * end, so the oracle replays the doubles bit-identically; final order
  * (score desc, shard asc) is fully pinned.
  *
  * Scale shape: shard-level STATISTICS only — df is a map-side-combined
  * count over (shard, term), cw one sum per shard; the scored grid is
  * |queries|·|terms|·C rows of ids and doubles, independent of corpus
  * size. The posting data itself is never touched at selection time.
  */
object ShardSelect {

  /** @param triples  (url, term, tf) posting triples
    * @param shardOf  expression mapping `url` to its shard id
    * @param queries  (query_id, distinct terms)
    * @param topR     shards returned per query
    * @return (query_id, shard, rank, score) — score rounded 6dp round-even */
  def cori(spark: SparkSession, triples: DataFrame, shardOf: Column,
           queries: Seq[(Int, Seq[String])], topR: Int,
           b: Double = 0.4): DataFrame = {
    require(topR >= 1, s"topR must be >= 1: $topR")
    require(queries.nonEmpty, "need at least one query")
    import spark.implicits._

    val posts = triples.select(shardOf.as("shard"), col("term"), col("tf"))
      .persist()
    // stats materialize (shards × lexicon-bounded terms) while posts is
    // cached, then the data-sized cache is released — everything after
    // this block touches statistics only
    val stats = posts.groupBy(col("shard"), col("term"))
      .agg(count(lit(1)).as("df"))            // triples are (url, term)-unique
      .localCheckpoint()
    // shard-count scalars: one tiny collect (shard-sized, not data-sized)
    val cwRows = posts.groupBy(col("shard")).agg(sum(col("tf")).as("cw"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    posts.unpersist()
    val cw = cwRows.toDF("shard", "cw")
    val cShards = cwRows.length
    val avgCw = cwRows.map(_._2).sum.toDouble / cShards
    val cf = stats.groupBy(col("term")).agg(count(lit(1)).as("cf"))

    val qterms = queries.flatMap { case (qid, ts) =>
      ts.distinct.map(t => (qid, t, ts.distinct.size))
    }.toDF("query_id", "qterm", "n_terms")
    val grid = qterms.crossJoin(broadcast(cw.select(col("shard"), col("cw"))))
      .join(stats.withColumnRenamed("term", "qterm"), Seq("shard", "qterm"), "left")
      .join(cf.withColumnRenamed("term", "qterm"), Seq("qterm"), "left")

    val tPart = col("df").cast("double") /
      (col("df").cast("double") + lit(50.0) +
        lit(150.0) * col("cw").cast("double") / lit(avgCw))
    val iPart = log((lit(cShards + 0.5)) / col("cf").cast("double")) /
      math.log(cShards + 1.0)
    val belief = when(col("df").isNotNull && col("df") > 0,
      lit(b) + lit(1.0 - b) * tPart * iPart).otherwise(lit(b))

    val scored = grid.select(col("query_id"), col("shard"), col("n_terms"),
        col("qterm"), belief.as("belief"))
      .groupBy(col("query_id"), col("shard"), col("n_terms"))
      .agg(aggregate(array_sort(collect_list(struct(col("qterm"), col("belief")))),
        lit(0.0), (acc, x) => acc + x.getField("belief")).as("s"))
      .select(col("query_id"), col("shard"),
        (col("s") / col("n_terms")).as("score"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("shard").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= topR)
      .select(col("query_id"), col("shard"), col("rank"),
        (bround(col("score") * 1e6, 0) / 1e6).as("score"))
  }
}
