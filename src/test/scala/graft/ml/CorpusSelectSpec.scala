package graft.ml

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The distributed prefix-sum selection must equal the literal sequential
  * prefix rule at any parallelism, including under a fused coalesce. */
class CorpusSelectSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("corpus-select-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** (id, quality, tokens) rows: quality cycles with ties, tokens vary. */
  private def rows(n: Int): Seq[(Long, Double, Long)] =
    (0 until n).map(i => (i.toLong, (i % 7).toDouble / 10.0, (i % 13 + 1).toLong))

  private def literalPrefix(rs: Seq[(Long, Double, Long)], budget: Long): Seq[(Long, Double, Long, Long)] = {
    val ordered = rs.sortBy { case (id, q, _) => (-q, id) }
    var cum = 0L
    val out = collection.mutable.ArrayBuffer.empty[(Long, Double, Long, Long)]
    var stopped = false
    for ((id, q, t) <- ordered if !stopped) {
      cum += t
      if (cum <= budget) out += ((id, q, t, cum)) else stopped = true
    }
    out.toSeq
  }

  test("equals the literal prefix rule, at several parallelism levels") {
    import spark.implicits._
    val data = rows(500)
    val expect = literalPrefix(data, budget = 800).sortBy(_._1)
    for (parts <- Seq(1, 3, 8)) {
      val df = data.toDF("id", "q", "t").repartition(parts)
      val got = CorpusSelect.selectByBudget(df, "id", col("q"), col("t"),
          budget = 800, parts = parts)
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      assert(got == expect, s"diverged at parts=$parts")
    }
  }

  test("budget larger than the corpus keeps everything; tiny budget keeps a prefix") {
    import spark.implicits._
    val data = rows(50)
    val df = data.toDF("id", "q", "t")
    val all = CorpusSelect.selectByBudget(df, "id", col("q"), col("t"), budget = 100000)
    assert(all.count() == 50)
    val total = data.map(_._3).sum
    assert(all.agg(max("cum_tokens")).head.getLong(0) == total)
    val one = CorpusSelect.selectByBudget(df, "id", col("q"), col("t"), budget = 13)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(one.toSeq == literalPrefix(data, 13).map(r => (r._1, r._4)))
    intercept[IllegalArgumentException] {
      CorpusSelect.selectByBudget(df, "id", col("q"), col("t"), budget = 0)
    }
  }

  test("selection survives a downstream coalesce (pid travels in the data)") {
    import spark.implicits._
    val data = rows(300)
    val got = CorpusSelect.selectByBudget(
        data.toDF("id", "q", "t").repartition(8), "id", col("q"), col("t"),
        budget = 500, parts = 8)
      .coalesce(1).collect()
      .map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1).toSeq
    assert(got == literalPrefix(data, 500).map(r => (r._1, r._4)).sortBy(_._1))
  }
}
