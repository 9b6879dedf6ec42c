package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011) — the compressed-codes ANN tier that
  * complements brute force (exact baseline) and IVF (partition routing):
  *
  *  - train: split the d-dim space into `m` subspaces; per subspace learn
  *    `k` centroids with deterministic Lloyd iterations (init = first k
  *    training sub-vectors, fixed iteration count, no RNG) over a bounded
  *    driver-side sample — at corpus scale codebooks are tiny (m·k·d/m
  *    doubles) and training reads a sample, never the table;
  *  - encode: one NARROW map replaces each vector with m small centroid
  *    ids — a 64-float embedding becomes 8 codes, so the search scan reads
  *    ~32× fewer bytes;
  *  - query: ADC (asymmetric distance computation) — one m×k lookup table
  *    of squared L2 distances from the query's sub-vectors to every
  *    centroid is broadcast, and each candidate costs m table lookups
  *    instead of d multiplications.
  *
  * Everything is deterministic and SQL-reproducible: q38's DuckDB oracle
  * recomputes the distance table from the dumped codebooks and folds code
  * distances in subspace order, matching the engine's summation exactly.
  */
object Pq {

  /** codebooks(m)(cid) = centroid sub-vector of subspace m. */
  final case class PqModel(m: Int, k: Int, dsub: Int,
                           codebooks: Array[Array[Array[Double]]])

  /** Deterministic per-subspace Lloyd over a bounded sample: the first
    * `sampleN` vectors in id order. */
  def train(df: DataFrame, idCol: String, vecCol: String,
            m: Int = 8, k: Int = 16, iters: Int = 5,
            sampleN: Int = 2000): PqModel = {
    val sample = df.orderBy(col(idCol))
      .select(col(vecCol).cast("array<double>"))
      .limit(sampleN).collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "PQ training sample is empty")
    val d = sample.head.length
    require(sample.forall(_.length == d),
      s"ragged training sample: expected every vector at dim $d")
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val dsub = d / m
    val codebooks = Array.tabulate(m) { mi =>
      val subs = sample.map(v => java.util.Arrays.copyOfRange(v, mi * dsub, (mi + 1) * dsub))
      // dedup by VALUE (Array equality is reference equality, so a plain
      // .distinct would be a no-op): degenerate corpora with many identical
      // sub-vectors must not seed k duplicate centroids
      var cents = subs.distinctBy(_.toIndexedSeq).take(k)
      // pad degenerate training sets by reusing the first centroid
      while (cents.length < k) cents = cents :+ cents.head.clone()
      for (_ <- 1 to iters) {
        val sums = Array.fill(k)(new Array[Double](dsub))
        val counts = new Array[Long](k)
        for (s <- subs) {
          val ci = Ann.nearest(s, cents)
          var i = 0
          while (i < dsub) { sums(ci)(i) += s(i); i += 1 }
          counts(ci) += 1
        }
        cents = Array.tabulate(k)(ci =>
          if (counts(ci) == 0) cents(ci) else sums(ci).map(_ / counts(ci)))
      }
      cents
    }
    PqModel(m, k, dsub, codebooks)
  }

  /** (id, code) — one narrow map; code(mi) = nearest centroid id in
    * subspace mi. */
  def encode(df: DataFrame, idCol: String, vecCol: String, model: PqModel): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val mb = spark.sparkContext.broadcast(model)
    df.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Seq[Double])]
      .map { case (id, v) =>
        val model = mb.value
        val arr = v.toArray
        // copyOfRange would silently ZERO-PAD a short vector past its end —
        // a ragged corpus row must fail loudly, not encode garbage codes
        require(arr.length == model.m * model.dsub,
          s"vector $id has dim ${arr.length}, model expects ${model.m * model.dsub}")
        val code = Array.tabulate(model.m) { mi =>
          val sub = java.util.Arrays.copyOfRange(arr, mi * model.dsub, (mi + 1) * model.dsub)
          Ann.nearest(sub, model.codebooks(mi))
        }
        (id, code)
      }.toDF(idCol, "code")
  }

  /** ADC squared-L2 lookup table: table(mi)(cid) = ||q_sub − centroid||². */
  def distanceTable(query: Array[Double], model: PqModel): Array[Array[Double]] = {
    // same zero-pad hazard as encode: a wrong-dimension query would produce
    // a plausible-looking but wrong table with no error
    require(query.length == model.m * model.dsub,
      s"query dim ${query.length} != model dim ${model.m * model.dsub}")
    Array.tabulate(model.m) { mi =>
      val qs = java.util.Arrays.copyOfRange(query, mi * model.dsub, (mi + 1) * model.dsub)
      model.codebooks(mi).map { c =>
        var d = 0.0; var i = 0
        while (i < qs.length) { val t = qs(i) - c(i); d += t * t; i += 1 }
        d
      }
    }
  }

  /** Top-k by ADC distance over the codes table: m table lookups per
    * candidate, summed in ascending subspace order (SQL-reproducible). */
  def adcTopK(codes: DataFrame, idCol: String, query: Array[Double],
              model: PqModel, k: Int): DataFrame = {
    val spark = codes.sparkSession
    import spark.implicits._
    val tb = spark.sparkContext.broadcast(distanceTable(query, model))
    codes.select(col(idCol).cast("long"), col("code"))
      .as[(Long, Seq[Int])]
      .map { case (id, code) =>
        val t = tb.value
        var d = 0.0; var mi = 0
        while (mi < code.length) { d += t(mi)(code(mi)); mi += 1 }
        (id, math.rint(d * 1e6) / 1e6)
      }.toDF(idCol, "adc_dist")
      .orderBy(col("adc_dist").asc, col(idCol).asc)
      .limit(k)
  }
}
