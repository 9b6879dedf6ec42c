package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.index.{BuiltIndex, IndexBuild}
import graft.text.{PorterStemmer, Text}

/** The query path expressed as DATASET OPERATIONS (north star: "top-k …
  * expressed as Dataset operations plus a broadcast term-dictionary") — the
  * distributed twin of the driver-side [[Searcher]]. Used when queries run
  * as analytical jobs over the index tables (batch scoring, query-log
  * replay); the driver-side path serves interactive p95.
  *
  * Plan shape:
  *  1. blocks are filtered by query term (parquet min/max pushdown when the
  *     blocks table is read term-sorted from disk);
  *  2. block-metadata pruning BEFORE decode: the reference's per-term
  *     200-posting cap means any block whose preceding blocks (in serving
  *     order) already hold ≥200 postings can be skipped — a window cumsum
  *     over block headers, no posting decoded;
  *  3. surviving blocks decode via flatMap; serving rank within term =
  *     window row_number over ((part_id, seq) block order, in-block serving
  *     order); cap 200;
  *  4. tfidf from the BROADCAST dictionary (df → idf with the reference's
  *     int division; max_tf → exact tfn) × stem factor;
  *  5. groupBy url sum, orderBy (score desc, url asc), limit 200.
  *
  * Known parity bound: the Backend's per-posting url-decode hygiene filter
  * (Backend.java:268-273; implemented in [[Searcher.termTfidf]] and the
  * oracle) is NOT applied here — it must run before the 200-cap, which in
  * this plan would force a docs join ahead of the cap. This path therefore
  * assumes canonicalized urls (the corpus contract); on dirty corpora use
  * the Searcher/LazySearcher tiers, whose filter is oracle-tested against
  * adversarial urls in IndexSpec.
  */
object QueryOps {

  /** Query expansion with reference semantics (surface terms first, stems
    * appended, put-overwrite) → ordered (term, stemFactor). */
  def termWeights(query: String): Seq[(String, Double)] = {
    val surface = Text.parseQuery(query)
    val expanded = surface.map(t => (t, false)) ++ surface.flatMap { t =>
      val st = PorterStemmer.stem(t)
      if (st != t) Some((st, true)) else None
    }
    val m = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    for ((t, isStem) <- expanded if t.nonEmpty) m.put(t, if (isStem) 0.7 else 1.0)
    m.toSeq
  }

  /** QUERY-LOG REPLAY: score a whole batch of queries in ONE distributed
    * pass — the at-scale serving workload (offline eval, log replay,
    * relevance regression). Each posting block of a shared term is decoded
    * ONCE for the entire batch, not once per query: blocks are pruned and
    * decoded per TERM, then joined against the broadcast (query_id, term,
    * factor) expansion table. Per-(query, doc) scores use the same ordered
    * fold as the single-query path, so every query's result is
    * bit-identical to [[Searcher.referenceTopK]] (IndexSpec asserts this).
    * Returns (query_id, rank, url, score). */
  def batchReferenceTopK(spark: SparkSession, built: BuiltIndex,
                         queries: Seq[String], n: Int): DataFrame = {
    import spark.implicits._
    // driver-side expansion: queries are tiny, terms lexicon-bounded
    val weights = queries.zipWithIndex.flatMap { case (q, qi) =>
      termWeights(q).zipWithIndex.map { case ((t, f), j) => (qi, t, f, j) }
    }
    val allTerms = weights.map(_._2).distinct
    if (allTerms.isEmpty) return spark.emptyDataFrame
      .withColumn("query_id", lit(0)).withColumn("rank", lit(0))
      .withColumn("url", lit("")).withColumn("score", lit(0.0)).limit(0)
    val dict = built.dictionary
      .filter($"term".isin(allTerms: _*))
      .collect().map(d => d.term -> d).toMap
    // idf==0 terms drop for every query (df is per-term, not per-query)
    val live = weights.filter { case (_, t, _, _) =>
      dict.get(t).exists(d => math.log((n / d.df).toDouble) / math.log(500.0) != 0.0)
    }
    if (live.isEmpty) return spark.emptyDataFrame
      .withColumn("query_id", lit(0)).withColumn("rank", lit(0))
      .withColumn("url", lit("")).withColumn("score", lit(0.0)).limit(0)
    val liveTerms = live.map(_._2).distinct
    val dictB = spark.sparkContext.broadcast(dict)

    // per-TERM block prune + decode, shared by every query in the batch
    val wOrd = Window.partitionBy($"term").orderBy($"part_id".asc, $"seq".asc)
    val pruned = built.blocks.filter($"term".isin(liveTerms: _*))
      .withColumn("prior_postings",
        coalesce(sum($"n").over(wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter($"prior_postings" < 200)
    val basePostings = pruned
      .as[(String, Int, Int, Int, Int, Array[Byte], Array[Byte], Array[Byte], Long)]
      .flatMap { case (term, pid, seq, nb, maxTf, docs, tfs, perm, prior) =>
        IndexBuild.decodeBlock(graft.index.PostingBlock(term, pid, seq, nb, maxTf, docs, tfs, perm))
          .iterator.zipWithIndex.collect {
            case ((docId, tf), i) if prior + i < 200 =>
              val d = dictB.value(term)
              val idf = math.log((n / d.df).toDouble) / math.log(500.0)
              (term, docId, (0.4 + 0.6 * tf / d.max_tf) * idf)
          }
      }.toDF("term", "doc_id", "base")

    val weightsDf = broadcast(live.toDF("query_id", "term", "factor", "qidx"))
    val scored = basePostings.join(weightsDf, Seq("term"))
      .select($"query_id", $"doc_id", $"qidx", ($"base" * $"factor").as("s"))
      .groupBy($"query_id", $"doc_id")
      .agg(aggregate(
        sort_array(collect_list(struct($"qidx", $"s"))),
        lit(0.0d), (acc, x) => acc + x.getField("s")).as("score"))

    // docs point fetch: In-filter pushdown while the touched id set is
    // small; a big batch's id set rides the broadcast join alone
    val ids = scored.select($"doc_id").distinct().as[Long].collect()
    val docsSide =
      if (ids.length <= 2048)
        built.docs.select($"doc_id", $"url").filter($"doc_id".isin(ids.toIndexedSeq: _*))
      else built.docs.select($"doc_id", $"url")
    val ranked = docsSide.join(broadcast(scored), Seq("doc_id"))
    val wRank = Window.partitionBy($"query_id").orderBy($"score".desc, $"url".asc)
    ranked.withColumn("rank", row_number().over(wRank))
      .filter($"rank" <= 200)
      .select($"query_id", $"rank", $"url", $"score")
  }

  /** Reference-compat scorer as a Dataset job. Returns (url, score). */
  def referenceTopK(spark: SparkSession, built: BuiltIndex, query: String,
                    n: Int): DataFrame = {
    import spark.implicits._
    val surface = Text.parseQuery(query)
    val expanded: Seq[(String, Boolean)] =
      surface.map(t => (t, false)) ++
        surface.flatMap { t =>
          val s = PorterStemmer.stem(t)
          if (s != t) Some((s, true)) else None
        }
    // term → (stemFactor) with put-overwrite semantics (later stem entry
    // overwrites an equal surface term, Backend.java:92)
    val termFactor = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    for ((t, isStem) <- expanded if t.nonEmpty)
      termFactor.put(t, if (isStem) 0.7 else 1.0)
    if (termFactor.isEmpty) return spark.emptyDataFrame.withColumn("url", lit(""))
      .withColumn("score", lit(0.0)).limit(0)

    // broadcast term dictionary (small by construction: lexicon-bounded)
    val dict = built.dictionary
      .filter($"term".isin(termFactor.keys.toSeq: _*))
      .collect().map(d => d.term -> d).toMap
    val live = termFactor.filter { case (t, _) =>
      dict.get(t).exists { d =>
        // idf==0 drop branch: log500(N/df) with Java int division
        math.log((n / d.df).toDouble) / math.log(500.0) != 0.0
      }
    }
    if (live.isEmpty) return spark.emptyDataFrame.withColumn("url", lit(""))
      .withColumn("score", lit(0.0)).limit(0)
    val factorB = spark.sparkContext.broadcast(live.toMap)
    val dictB = spark.sparkContext.broadcast(dict)

    val qBlocks = built.blocks.filter($"term".isin(live.keys.toSeq: _*))

    // --- block-metadata pruning: skip blocks entirely past the 200-cap ---
    val wOrd = Window.partitionBy($"term").orderBy($"part_id".asc, $"seq".asc)
    val pruned = qBlocks
      .withColumn("prior_postings",
        coalesce(sum($"n").over(wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter($"prior_postings" < 200)

    // --- decode survivors; serving rank = prior + in-block index ---
    val termIdx = spark.sparkContext.broadcast(
      live.keys.zipWithIndex.toMap) // query-order index for deterministic summation
    val postings = pruned.as[(String, Int, Int, Int, Int, Array[Byte], Array[Byte], Array[Byte], Long)]
      .flatMap { case (term, pid, seq, nb, maxTf, docs, tfs, perm, prior) =>
        IndexBuild.decodeBlock(graft.index.PostingBlock(term, pid, seq, nb, maxTf, docs, tfs, perm))
          .iterator.zipWithIndex.collect {
            case ((docId, tf), i) if prior + i < 200 => // per-term 200-cap
              val d = dictB.value(term)
              val idf = math.log((n / d.df).toDouble) / math.log(500.0)
              val tfn = 0.4 + 0.6 * tf / d.max_tf
              (docId, termIdx.value(term), tfn * idf * factorB.value(term))
          }
      }.toDF("doc_id", "idx", "tfidf")

    // per-doc score = FOLD of contributions in query-term order (sort_array
    // + higher-order aggregate): bit-identical to the driver-side scorer's
    // sequential summation, immune to partition-order reassociation
    val scored = postings
      .groupBy($"doc_id")
      .agg(aggregate(
        sort_array(collect_list(struct($"idx", $"tfidf"))),
        lit(0.0d), (acc, x) => acc + x.getField("tfidf")).as("score"))

    // capped postings are tiny (≤200 per live term): materialize their doc
    // ids and PUSH them into the docs scan as an In-filter (partition/
    // row-group pruning on a doc_id-sorted docs table), then broadcast the
    // scored side — the docs table is never fully scanned per query
    val scoredRows = scored.collect()
    if (scoredRows.isEmpty) return spark.emptyDataFrame.withColumn("url", lit(""))
      .withColumn("score", lit(0.0)).limit(0)
    val ids = scoredRows.map(_.getLong(0)).toIndexedSeq
    val scoredDf = spark.createDataFrame(
      spark.sparkContext.parallelize(scoredRows.toIndexedSeq, 1), scored.schema)
    built.docs.select($"doc_id", $"url")
      .filter($"doc_id".isin(ids: _*))
      .join(broadcast(scoredDf), Seq("doc_id"))
      .select($"url", $"score")
      .orderBy($"score".desc, $"url".asc)
      .limit(200)
  }
}
