package graft.ml

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Registers must match a local bit-twiddled replay of the portable hash,
  * sketches must merge register-wise (max / sum), and the estimates must
  * carry their textbook guarantees on deterministic data. */
class SketchesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("sketches-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def localHll(items: Seq[String], p: Int): Map[Long, Int] = {
    val w = 60 - p
    items.foldLeft(Map.empty[Long, Int]) { (regs, s) =>
      val h = PortableHash.h60(s)
      val bucket = h >>> w
      val rem = h & ((1L << w) - 1L)
      val rho = if (rem == 0L) w + 1
        else w - (63 - java.lang.Long.numberOfLeadingZeros(rem))
      regs.updated(bucket, math.max(regs.getOrElse(bucket, 0), rho))
    }
  }

  test("hll registers equal the local replay") {
    import spark.implicits._
    val items = (1 to 2000).map(i => s"item-$i")
    val got = Sketches.hllRegisters(items.toDF("x"), col("x"), p = 9)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == localHll(items, 9))
  }

  test("hll estimate within 10% on 50k distinct; duplicates don't move it") {
    import spark.implicits._
    val n = 50000
    val df = (1 to n).map(i => s"user-$i").toDF("x")
    val est = Sketches.hllEstimate(Sketches.hllRegisters(df, col("x"), 9), 9)
    assert(math.abs(est - n) / n < 0.10, s"estimate $est for $n")
    val dup = df.union(df.limit(10000)) // re-inserts must not change registers
    val est2 = Sketches.hllEstimate(Sketches.hllRegisters(dup, col("x"), 9), 9)
    assert(est2 == est)
  }

  test("hll registers merge by register-wise max") {
    import spark.implicits._
    val a = (1 to 3000).map(i => s"a-$i").toDF("x")
    val b = (1 to 3000).map(i => s"b-$i").toDF("x")
    val merged = Sketches.hllRegisters(a, col("x"), 8)
      .unionByName(Sketches.hllRegisters(b, col("x"), 8))
      .groupBy("bucket").agg(max("max_rho").as("max_rho"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val whole = Sketches.hllRegisters(a.unionByName(b), col("x"), 8)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(merged == whole)
  }

  test("grouped registers roll up losslessly: hllMerge(by-group) == whole") {
    import spark.implicits._
    val df = (1 to 6000).map(i => (s"g${i % 3}", s"item-${i % 2000}"))
      .toDF("g", "x")
    val byGroup = Sketches.hllRegistersBy(df, Seq("g"), col("x"), 8)
    assert(byGroup.select("g").distinct().count() == 3)
    val merged = Sketches.hllMerge(byGroup, Nil)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val whole = Sketches.hllRegisters(df, col("x"), 8)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(merged == whole)
    // partial rollup keeps the kept key and stays a valid register table
    val kept = Sketches.hllMerge(byGroup.withColumn("month", lit("m1")),
      Seq("month"))
    assert(kept.columns.toSeq == Seq("month", "bucket", "max_rho"))
    assert(kept.collect().map(r => r.getLong(1) -> r.getInt(2)).toMap == whole)
  }

  test("count-min: estimate >= truth, tight for a heavy key, merges by sum") {
    import spark.implicits._
    // zipf-ish: key-1 appears 1000x, key-k appears 1000/k times
    val items = (1 to 50).flatMap(k => Seq.fill(1000 / k)(s"key-$k"))
    val df = items.toDF("x")
    val (d, w) = (4, 256)
    val counters = Sketches.countMin(df, col("x"), d, w)
    val truth = items.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    truth.foreach { case (k, t) =>
      val est = Sketches.cmEstimate(counters, k, d, w)
      assert(est >= t, s"$k: est $est < true $t")
      assert(est <= t + 4L * items.size / w, s"$k: est $est way over $t")
    }
    // counters of two halves sum to the whole table's counters
    val (h1, h2) = items.splitAt(items.size / 2)
    val summed = Sketches.countMin(h1.toDF("x"), col("x"), d, w)
      .unionByName(Sketches.countMin(h2.toDF("x"), col("x"), d, w))
      .groupBy("row", "col").agg(sum("cnt").as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = counters.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(summed == whole)
  }

  test("hll overlap: inclusion-exclusion estimates track the true overlap") {
    import spark.implicits._
    val a = (0L until 3000L).toDF("x")
    val b = (2000L until 5000L).toDF("x") // true overlap 1000, union 5000
    val regA = Sketches.hllRegisters(a, col("x"), 10)
    val regB = Sketches.hllRegisters(b, col("x"), 10)
    val (ea, eb, eu, ei) = Sketches.hllOverlap(regA, regB, 10)
    assert(math.abs(ea - 3000) / 3000.0 < 0.1)
    assert(math.abs(eb - 3000) / 3000.0 < 0.1)
    assert(math.abs(eu - 5000) / 5000.0 < 0.1)
    // intersection inherits both errors — generous bound, but it must
    // clearly separate overlap-1000 from disjoint
    assert(ei > 300 && ei < 1700)
    assert(math.abs((ea + eb - eu) - ei) < 1e-12) // the identity itself
    // disjoint sets estimate near zero (possibly slightly negative)
    val c = (100000L until 103000L).toDF("x")
    val regC = Sketches.hllRegisters(c, col("x"), 10)
    val (_, _, _, eid) = Sketches.hllOverlap(regA, regC, 10)
    assert(math.abs(eid) < 600)
  }
}
