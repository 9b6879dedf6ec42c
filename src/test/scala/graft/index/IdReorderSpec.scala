package graft.index

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

class IdReorderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("id-reorder-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("varbyte length thresholds are exact") {
    import spark.implicits._
    val got = Seq(1L, 127L, 128L, 16383L, 16384L, (1L << 21) - 1, 1L << 21,
        (1L << 28) - 1, 1L << 28, 1L << 35)
      .toDF("g").select(IdReorder.vbLen(col("g"))).as[Long].collect().toSeq
    assert(got == Seq(1L, 1L, 2L, 2L, 3L, 3L, 4L, 4L, 5L, 6L))
  }

  /** Literal recomputation of the report for any triple set. */
  private def expected(triples: Seq[(String, String)]): Map[String, (Long, Long)] = {
    def vb(g: Long): Long =
      Seq(7, 14, 21, 28, 35, 42, 49, 56).indexWhere(b => g < (1L << b)) match {
        case -1 => 9L; case i => i + 1L
      }
    val urls = triples.map(_._1).distinct
    val assignments = Map(
      "url_sorted" -> urls.sorted.zipWithIndex.toMap,
      "hashed" -> urls.sortBy(u => (graft.ml.PortableHash.h60(u), u))
        .zipWithIndex.toMap)
    assignments.map { case (scheme, ids) =>
      val gaps = triples.distinct.groupBy(_._2).values.flatMap { ps =>
        val sorted = ps.map(p => ids(p._1).toLong).sorted
        sorted.zip(-1L +: sorted.dropRight(1)).map { case (a, b) => a - b }
      }.toSeq
      scheme -> (gaps.size.toLong, gaps.map(vb).sum)
    }
  }

  test("report matches the literal recomputation and clustering wins") {
    import spark.implicits._
    // two "hosts": pages a0..a9 share term ta, b0..b9 share tb — url order
    // clusters each term's postings into adjacent ids (all gaps 1)
    val triples = (0 until 10).flatMap(i =>
      Seq((f"http://a/$i%02d", "ta"), (f"http://b/$i%02d", "tb"))) ++
      (0 until 20).map(i => (f"http://${('a' + i % 2).toChar}/${i / 2}%02d", "common"))
    val df = triples.toDF("url", "term").withColumn("tf", lit(1))
    val got = IdReorder.report(spark, df, parts = 4)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == expected(triples))
    // the clustered assignment must not cost more than the random one
    assert(got("url_sorted")._2 <= got("hashed")._2)
    assert(got("url_sorted")._1 == got("hashed")._1) // same postings
  }

  test("deterministic across parallelism") {
    import spark.implicits._
    val triples = (0 until 300).map(i =>
      (s"http://h${i % 17}/p/${i % 53}", s"t${i % 11}")).distinct
    val df = triples.toDF("url", "term")
    val a = IdReorder.report(spark, df, parts = 2)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    val b = IdReorder.report(spark, df, parts = 7)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
    assert(a == expected(triples).toSeq.sortBy(_._1)
      .map { case (s, (p, by)) => (s, p, by) })
  }
}
