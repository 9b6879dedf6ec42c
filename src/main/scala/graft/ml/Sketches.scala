package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed frequency/cardinality sketches with EXACTLY reproducible
  * register contents — the web-analytics ops ("how many distinct users /
  * urls / queries", "how often does this key appear") that must never run
  * a distinct or a per-key groupBy at 100 TB.
  *
  * Both sketches reduce the data to a FIXED-size aggregate (2^p HLL
  * registers; d×w Count-Min counters) with one map-side-combined
  * aggregation — shuffle volume is the sketch size times the partition
  * count, independent of data volume, and sketches of disjoint inputs
  * merge by max/sum (register-wise), which is what makes them
  * incremental-ingest friendly.
  *
  * Register values are bit-exact functions of [[PortableHash]]'s md5-based
  * 60-bit hash (`conv(substr(md5(x),1,15),16,10)` in Spark, the same
  * expression in the DuckDB oracle), so the driver checks the REGISTERS
  * verbatim, not just the estimate: rho is computed by a generated
  * bit-test CASE chain, never floating log2 (whose rounding at exact
  * powers of two silently shifts a register by one).
  */
object Sketches {

  /** The portable 60-bit hash as a pure built-in column expression
    * (md5 → 15 hex chars → base-16 conv) — codegen'd, no UDF. */
  def h60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** HyperLogLog register table: bucket = top p bits of the 60-bit hash,
    * rho = 1-based position of the first set bit in the remaining
    * (60-p) bits (61-p if they are all zero). Returns one row per
    * NON-EMPTY bucket: (bucket, max_rho); absent buckets mean rho 0. */
  def hllRegisters(df: DataFrame, item: Column, p: Int): DataFrame =
    hllRegistersBy(df, Nil, item, p)

  /** One register table PER KEY GROUP: (keys…, bucket, max_rho) — e.g. one
    * HLL per day/source/shard. Pair with [[hllMerge]] to roll groups up
    * without touching the raw data again. */
  def hllRegistersBy(df: DataFrame, keys: Seq[String], item: Column,
                     p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16]: $p")
    val w = 60 - p
    val h = h60(item)
    val bucket = shiftright(h, w).as("bucket")
    val rem = h.bitwiseAND(lit((1L << w) - 1L))
    val rho = (1 to w).foldLeft(when(lit(false), lit(0))) { (acc, r) =>
        acc.when(shiftright(rem, w - r).bitwiseAND(lit(1L)) === 1L, lit(r))
      }.otherwise(lit(w + 1)).as("rho")
    df.select(keys.map(col) :+ bucket :+ rho: _*)
      .groupBy((keys :+ "bucket").map(col): _*)
      .agg(max("rho").as("max_rho"))
  }

  /** Merge register tables down to `keys` (e.g. daily → monthly, or all
    * the way to a single global table with `keys = Nil`): elementwise max
    * per bucket. This is THE sketch property that makes HLL the 100-TB
    * distinct counter — registers of a union are EXACTLY the max of the
    * parts' registers, so partitioned sketches roll up losslessly with a
    * register-sized (≤ 2^p per group) shuffle, never re-reading raw data. */
  def hllMerge(registers: DataFrame, keys: Seq[String]): DataFrame =
    registers.groupBy((keys :+ "bucket").map(col): _*)
      .agg(max(col("max_rho")).as("max_rho"))

  /** Standard HLL estimate from [[hllRegisters]] output (driver-side over
    * ≤ 2^p rows): bias-corrected harmonic mean with the linear-counting
    * small-range correction. */
  def hllEstimate(registers: DataFrame, p: Int): Double = {
    val m = 1 << p
    val regs = registers.collect()
      .map(r => r.getLong(0).toInt -> r.getInt(1)).toMap
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    val sum = (0 until m).map(j => math.pow(2.0, -regs.getOrElse(j, 0).toDouble)).sum
    val e = alpha * m * m / sum
    val zeros = m - regs.size
    if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else e
  }

  /** Count-Min counter table: d affine hash rows × w columns; counter
    * (row, col) = number of items whose row-th portable affine hash lands
    * in col. Returns only non-zero counters: (row, col, cnt). Point
    * estimate for key x = min over rows of counter(row, affine_row(x)%w)
    * — always ≥ the true count (see [[cmEstimate]]). */
  def countMin(df: DataFrame, item: Column, d: Int, w: Int): DataFrame = {
    require(d >= 1 && d <= 16, s"d must be in [1,16]: $d")
    require(w >= 2, s"w must be >= 2: $w")
    val h = h60(item)
    val rows = (0 until d).map { i =>
      val col = (lit(PortableHash.aOf(i)) * (h % PortableHash.P)
        + lit(PortableHash.bOf(i))) % PortableHash.P % w
      struct(lit(i).as("row"), col.as("col"))
    }
    df.select(explode(array(rows: _*)).as("rc"))
      .groupBy(col("rc.row").as("row"), col("rc.col").as("col"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Count-Min point estimate for one key (driver-side over d rows of the
    * counter table — the serving-time read). */
  def cmEstimate(counters: DataFrame, key: String, d: Int, w: Int): Long = {
    val h = PortableHash.h60(key)
    val cols = (0 until d).map(i => i -> (PortableHash.affine(i, h) % w))
    val lookup = counters.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    cols.map { case (i, c) => lookup.getOrElse((i, c), 0L) }.min
  }

  /** Set-overlap estimation between two register tables by
    * inclusion–exclusion: |A∩B| ≈ E(A) + E(B) − E(A∪B), where the union's
    * registers are EXACTLY the elementwise max ([[hllMerge]]'s property) —
    * the way two 100-TB crawl segments compare url/content sets without
    * ever joining them. Returns (estA, estB, estUnion, estIntersection);
    * the intersection estimate can be slightly negative for near-disjoint
    * sets (standard HLL behavior — callers clamp if they need to). */
  def hllOverlap(regA: DataFrame, regB: DataFrame, p: Int): (Double, Double, Double, Double) = {
    val eA = hllEstimate(regA, p)
    val eB = hllEstimate(regB, p)
    val eU = hllEstimate(hllMerge(regA.unionByName(regB), Nil), p)
    (eA, eB, eU, eA + eB - eU)
  }
}
