package graft.query

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class BootstrapEvalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("bootstrap-eval-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def pick(r: Long, j: Long, n: Int): Int =
    (graft.ml.PortableHash.h60(s"$r|$j") % n).toInt

  /** Literal replay of the whole bootstrap. */
  private def literal(deltas: Seq[(Long, Double)], b: Int) = {
    val byIdx = deltas.sortBy(_._1).map(_._2).toIndexedSeq
    val n = byIdx.size
    val means = (0 until b).map { r =>
      val s = (0 until n).map(j => byIdx(pick(r, j, n)))
        .foldLeft(0.0)(_ + _)
      (r.toLong, s / n)
    }
    val ranked = means.sortBy { case (r, m) => (m, r) }.map(_._2)
    val lo = ranked(((25L * b + 999L) / 1000L).toInt - 1)
    val hi = ranked(((975L * b + 999L) / 1000L).toInt - 1)
    val obs = byIdx.foldLeft(0.0)(_ + _) / n
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    (n.toLong, b.toLong, r6(obs), r6(lo), r6(hi), lo > 0.0 || hi < 0.0)
  }

  private def run(deltas: Seq[(Long, Double)], b: Int) =
    BootstrapEval.pairedTest(spark, deltas.toDF("query_id", "delta"), b)
      .as[(Long, Long, Double, Double, Double, Boolean)].head()

  test("matches the literal bootstrap replay") {
    val deltas = Seq((3L, 0.12), (7L, -0.05), (11L, 0.31), (20L, 0.02),
      (41L, -0.11))
    assert(run(deltas, 40) == literal(deltas, 40))
  }

  test("uniformly positive deltas are significant, sign-balanced are not") {
    val pos = (0L until 8L).map(q => (q, 0.1 + 0.01 * q))
    val got = run(pos, 40)
    assert(got._6 && got._4 > 0.0)
    val mixed = (0L until 8L).map(q => (q, if (q % 2 == 0) 0.1 else -0.1))
    assert(!run(mixed, 200)._6)
  }

  test("bad args are loud") {
    intercept[IllegalArgumentException](
      run(Seq((1L, 0.1)), 10)) // too few replicas
    intercept[IllegalArgumentException](
      BootstrapEval.pairedTest(spark,
        Seq.empty[(Long, Double)].toDF("query_id", "delta"), 40))
  }
}
