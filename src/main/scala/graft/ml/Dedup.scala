package graft.ml

import scala.util.hashing.MurmurHash3
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale training-data deduplication operators.
  *
  * All signature computation is a narrow map (no shuffle); candidate
  * generation shuffles only (docId, bucketKey) pairs — never document text —
  * so the shuffle volume at 100 TB is proportional to numDocs × bands, not
  * corpus bytes. Verification joins fetch text for candidate pairs only.
  */
object Dedup {

  // ------------------------------------------------------------------ exact
  /** Exact dedup domain: content-hash groups with their cardinality.
    * `md5` is codegen'd and pushdown-friendly; at scale this is a pure
    * map-side-combined aggregation. */
  def exactHashGroups(df: DataFrame, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_doc_id"))

  /** Survivors of exact dedup: the min-id representative per hash group. */
  def exactDedup(df: DataFrame, textCol: String): DataFrame = {
    val reps = exactHashGroups(df, textCol).select(col("keep_doc_id").as("doc_id"))
    df.join(reps, Seq("doc_id"), "left_semi")
  }

  // ---------------------------------------------------------------- minhash
  /** Word k-shingles of a whitespace-tokenized lowercase text. */
  def shingles(text: String, k: Int): Set[String] = {
    val toks = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
    if (toks.length < k) Set(toks.mkString(" "))
    else toks.sliding(k).map(_.mkString(" ")).toSet
  }

  /** MinHash signature: for hash function i, min over shingles of
    * murmur3(shingle, seed=i). Deterministic across runs and parallelism. */
  def minhashSignature(text: String, k: Int, numHashes: Int): Array[Int] = {
    val sh = shingles(text, k)
    val sig = Array.fill(numHashes)(Int.MaxValue)
    for (s <- sh) {
      var i = 0
      while (i < numHashes) {
        val h = MurmurHash3.stringHash(s, i)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
    }
    sig
  }

  /** (doc_id, band, band_hash) — LSH bucketing rows, `bands` per doc.
    * Shuffle-light: one small row per (doc, band). */
  def minhashBands(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 3, numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val rows = numHashes / bands
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .flatMap { case (id, text) =>
        val sig = minhashSignature(text, k, numHashes)
        (0 until bands).iterator.map { b =>
          val slice = sig.slice(b * rows, (b + 1) * rows)
          (id, b, MurmurHash3.arrayHash(slice, b))
        }
      }.toDF(idCol, "band", "band_hash")
  }

  /** Candidate near-dup pairs: docs sharing any LSH band bucket.
    * Self-join on (band, band_hash); id1 < id2 dedupes the pair space. */
  def minhashCandidates(bandsDf: DataFrame, idCol: String): DataFrame = {
    val a = bandsDf.select(col(idCol).as("id1"), col("band"), col("band_hash"))
    val b = bandsDf.select(col(idCol).as("id2"), col("band"), col("band_hash"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
  }

  /** Exact n-gram Jaccard verification of candidate pairs: joins text back
    * for CANDIDATES only (the scale-critical property). */
  def jaccardVerify(df: DataFrame, candidates: DataFrame, idCol: String,
                    textCol: String, k: Int = 3, threshold: Double = 0.0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val texts = df.select(col(idCol).cast("long").as("jid"), col(textCol).as("jtext"))
    val joined = candidates
      .join(texts, col("id1") === col("jid")).withColumnRenamed("jtext", "text1").drop("jid")
      .join(texts, col("id2") === col("jid")).withColumnRenamed("jtext", "text2").drop("jid")
    joined.select($"id1", $"id2", $"text1", $"text2").as[(Long, Long, String, String)]
      .map { case (id1, id2, t1, t2) =>
        val s1 = shingles(t1, k); val s2 = shingles(t2, k)
        val inter = (s1 & s2).size
        val union = (s1 | s2).size
        (id1, id2, if (union == 0) 0.0 else inter.toDouble / union)
      }.toDF("id1", "id2", "jaccard")
      .filter(col("jaccard") >= threshold)
  }

  // ---------------------------------------------------------------- simhash
  /** 64-bit SimHash over whitespace tokens (Charikar 2002): per-token hash
    * votes each bit up/down; fingerprint bit = sign of the vote. */
  def simhash64(text: String): Long = {
    val votes = new Array[Int](64)
    for (tok <- text.toLowerCase.trim.split("\\s+") if tok.nonEmpty) {
      val h1 = MurmurHash3.stringHash(tok, 0).toLong & 0xFFFFFFFFL
      val h2 = MurmurHash3.stringHash(tok, 1).toLong & 0xFFFFFFFFL
      val h = (h1 << 32) | h2
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var f = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) f |= (1L << b); b += 1 }
    f
  }

  def simhashes(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .map { case (id, t) => (id, simhash64(t)) }
      .toDF(idCol, "simhash")
  }

  /** Near-dup pairs by Hamming distance ≤ maxDist via the pigeonhole band
    * trick: split 64 bits into maxDist+1 bands; any pair within distance
    * shares at least one exact band → join per band, verify distance. */
  def simhashPairs(sims: DataFrame, idCol: String, maxDist: Int = 3): DataFrame = {
    val nBands = maxDist + 1
    val width = 64 / nBands
    val spark = sims.sparkSession
    import spark.implicits._
    val banded = sims.select(col(idCol).cast("long"), col("simhash")).as[(Long, Long)]
      .flatMap { case (id, sh) =>
        (0 until nBands).iterator.map { b =>
          val lo = b * width
          val w = if (b == nBands - 1) 64 - lo else width
          val mask = if (w == 64) -1L else (1L << w) - 1
          (id, sh, b, (sh >>> lo) & mask)
        }
      }.toDF(idCol, "simhash", "band", "band_bits")
    val a = banded.select(col(idCol).as("id1"), col("simhash").as("sh1"), col("band"), col("band_bits"))
    val b = banded.select(col(idCol).as("id2"), col("simhash").as("sh2"), col("band"), col("band_bits"))
    a.join(b, Seq("band", "band_bits"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        bit_count(col("sh1").bitwiseXOR(col("sh2"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  // ----------------------------------------------------- embedding near-dup
  /** Cosine similarity of two float-array columns as a codegen-friendly
    * column expression (sequential folds; no UDF). */
  def cosineCol(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)
    val n1 = aggregate(a, lit(0.0d), (acc, v) => acc + v * v)
    val n2 = aggregate(b, lit(0.0d), (acc, v) => acc + v * v)
    dot / (sqrt(n1) * sqrt(n2))
  }

  /** Embedding near-dup pairs above `threshold`, using random-hyperplane LSH
    * buckets to avoid the O(n²) cross join at scale (brute force only within
    * a bucket). `planes` seeded → deterministic. */
  def embeddingDupPairs(df: DataFrame, idCol: String, vecCol: String,
                        threshold: Double, nPlanes: Int = 8, dim: Int = 64,
                        seed: Long = 42L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rng = new java.util.Random(seed)
    val planes = Array.fill(nPlanes, dim)(rng.nextGaussian())
    val pb = spark.sparkContext.broadcast(planes)
    val sigs = df.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Seq[Double])]
      .map { case (id, v) =>
        var sig = 0
        var p = 0
        while (p < pb.value.length) {
          var d = 0.0; var i = 0
          val plane = pb.value(p)
          while (i < v.length && i < plane.length) { d += v(i) * plane(i); i += 1 }
          if (d >= 0) sig |= (1 << p)
          p += 1
        }
        (id, v, sig)
      }.toDF(idCol, "vec", "bucket")
    val a = sigs.select(col(idCol).as("id1"), col("vec").as("v1"), col("bucket"))
    val b = sigs.select(col(idCol).as("id2"), col("vec").as("v2"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), cosineCol(col("v1"), col("v2")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .select(col("id1"), col("id2"), round(col("cosine"), 4).as("cosine"))
      .distinct()
  }
}
