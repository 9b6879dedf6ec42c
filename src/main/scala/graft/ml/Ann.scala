package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — one narrow map over the vectors plus
  * a k-row global top-k (Spark's sort-limit is a per-partition top-k merge,
  * not a full sort, so this scales linearly).
  *
  * Scale path: IVF (inverted-file) routing — vectors are assigned to the
  * nearest of C seeded centroids at write time (cheap k-means-- with fixed
  * seeds keeps it deterministic); a query probes only the nProbe nearest
  * centroid partitions, turning a 10^12-vector scan into a
  * (nProbe/C)-fraction scan. Parquet partitioning by centroid id gives
  * partition pruning on the probe set.
  */
object Ann {

  /** Brute-force cosine top-k for one query vector (codegen'd expression,
    * no UDF; vectors cast to double so the fold is exact + stable). */
  def bruteTopK(df: DataFrame, idCol: String, vecCol: String,
                query: Seq[Double], k: Int): DataFrame = {
    val qLit = typedLit(query)
    df.select(col(idCol),
        Dedup.cosineCol(col(vecCol).cast("array<double>"), qLit).as("cosine"))
      // zero-norm vectors (or a zero-norm query) make cosine NaN, and Spark
      // sorts NaN ABOVE every double — without this filter a padding vector
      // would take rank 1; cosine is undefined there, so the row is excluded
      .filter(!isnan(col("cosine")))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Deterministic centroids: the C vectors with the smallest ids, refined
    * by `iters` rounds of Lloyd assignment (fixed iteration count, no RNG).
    * Seeding MUST be id-ordered, not `take(c)` — take returns the first rows
    * in physical scan order, which shifts with file layout/parallelism/AQE,
    * and nondeterministic seeds silently desynchronize recomputed centroids
    * from an already-written routing table. */
  def centroids(df: DataFrame, idCol: String, vecCol: String, c: Int,
                iters: Int = 3): Array[Array[Double]] = {
    val spark = df.sparkSession
    import spark.implicits._
    // persisted: the seed take plus each Lloyd round re-reads the vectors
    val vecs = df.select(col(vecCol).cast("array<double>")).as[Seq[Double]]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cents = df.orderBy(col(idCol).asc)
      .select(col(vecCol).cast("array<double>")).as[Seq[Double]]
      .take(c).map(_.toArray)
    for (_ <- 1 to iters) {
      val cb = spark.sparkContext.broadcast(cents)
      val sums = vecs.map { v =>
        (Ann.nearest(v.toArray, cb.value), (v.toArray, 1L))
      }.rdd.reduceByKey { (x: (Array[Double], Long), y: (Array[Double], Long)) =>
        val s = x._1.clone()
        var i = 0
        while (i < s.length) { s(i) += y._1(i); i += 1 }
        (s, x._2 + y._2)
      }.collect()
      val next = cents.clone()
      for ((ci, (s, n)) <- sums) next(ci) = s.map(_ / n)
      cents = next
    }
    vecs.unpersist()
    cents
  }

  private[ml] def nearest(v: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var ci = 0
    while (ci < cents.length) {
      var d = 0.0; var i = 0
      val c = cents(ci)
      while (i < v.length) { val t = v(i) - c(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = ci }
      ci += 1
    }
    best
  }

  /** IVF index: (id, vec, centroid) — write-time routing table. */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String,
                cents: Array[Array[Double]]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cb = spark.sparkContext.broadcast(cents)
    df.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Seq[Double])]
      .map { case (id, v) => (id, v, nearest(v.toArray, cb.value)) }
      .toDF(idCol, "vec", "centroid")
  }

  /** The nProbe centroid ids nearest to the query (squared L2). */
  def probeSet(cents: Array[Array[Double]], query: Array[Double], nProbe: Int): Seq[Int] =
    cents.zipWithIndex.sortBy { case (c, _) =>
      var d = 0.0; var i = 0
      while (i < query.length) { val t = query(i) - c(i); d += t * t; i += 1 }
      d
    }.take(nProbe).map(_._2).toIndexedSeq

  /** IVF query: probe the nProbe nearest centroid partitions only. */
  def ivfTopK(assigned: DataFrame, idCol: String, query: Array[Double],
              cents: Array[Array[Double]], k: Int, nProbe: Int): DataFrame = {
    val probes = probeSet(cents, query, nProbe)
    bruteTopK(assigned.filter(col("centroid").isin(probes: _*)),
      idCol, "vec", query.toIndexedSeq, k)
  }

  /** Persist the routing table PARTITIONED BY CENTROID — the write-time
    * layout that turns probing into real partition pruning: a query lists
    * only the nProbe centroid directories, so the scan fraction is
    * nProbe/C of the corpus regardless of total size. */
  def ivfWrite(assigned: DataFrame, dir: String): Unit =
    // one shuffle on centroid → one file per centroid dir instead of
    // tasks x centroids small files (cap production file sizes with
    // spark.sql.files.maxRecordsPerFile)
    assigned.repartition(col("centroid"))
      .write.mode("overwrite").partitionBy("centroid").parquet(dir)

  /** IVF query over the on-disk partitioned routing table. The centroid
    * In-filter is a partition filter (MlSpec asserts `PartitionFilters`
    * in the physical plan), so non-probed partitions are never read. */
  def ivfTopKOnDisk(spark: org.apache.spark.sql.SparkSession, dir: String,
                    idCol: String, query: Array[Double],
                    cents: Array[Array[Double]], k: Int, nProbe: Int): DataFrame = {
    val probes = probeSet(cents, query, nProbe)
    bruteTopK(spark.read.parquet(dir).filter(col("centroid").isin(probes: _*)),
      idCol, "vec", query.toIndexedSeq, k)
  }
}
