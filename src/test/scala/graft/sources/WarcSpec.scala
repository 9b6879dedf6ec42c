package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.{Corpus, Page}

/** The WARC roundtrip must be byte-exact per record, survive payloads that
  * embed the record magic (length-driven parse, never delimiter-driven),
  * parse multi-record segments, and be deterministic across parallelism. */
class WarcSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("warc-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("adversarial payload containing the WARC magic roundtrips byte-exact") {
    val evil = ("<html>\r\n\r\nWARC/1.0\r\nContent-Length: 999\r\n\r\n" +
      "not a record</html>").getBytes(UTF_8)
    val pages = Seq(
      Page("http://a/x", ts(1700000000L), evil, "t", "en"),
      Page("http://a/y", ts(1700000001L), Array[Byte](), "t", "en"), // empty body
      Page("http://b/z", ts(1700000002L), "plain".getBytes(UTF_8), "t", "en"))
    val seg = pages.flatMap(p => Warc.record(p.url, p.warc_ts, p.html)).toArray
    val parsed = Warc.parseSegment(seg).toSeq
    assert(parsed.map(_._1) == pages.map(_.url))
    assert(parsed.map(_._2) == pages.map(p => Warc.warcDate(p.warc_ts)))
    assert(parsed.zip(pages).forall { case ((_, _, got), p) =>
      java.util.Arrays.equals(got, p.html) })
  }

  test("distributed write + read over the synthetic corpus is lossless") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("warc").toString
    val pages = Corpus.generate(spark, 200).repartition(5)
    val segments = Warc.writeSegments(pages, dir)
    assert(segments >= 2, s"expected multiple segments, got $segments")
    val back = Warc.read(spark, dir)
      .select($"url", $"warc_date", org.apache.spark.sql.functions.md5($"html").as("h"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    def md5hex(b: Array[Byte]): String = java.security.MessageDigest
      .getInstance("MD5").digest(b).map("%02x".format(_)).mkString
    val want = Corpus.generateLocal(200).map(p =>
      (p.url, Warc.warcDate(p.warc_ts), md5hex(p.html))).toSet
    assert(back == want)
  }

  test("truncated segment fails loudly") {
    val rec = Warc.record("http://a/x", ts(1L), "body".getBytes(UTF_8))
    val cut = java.util.Arrays.copyOfRange(rec, 0, rec.length - 6)
    val e = intercept[IllegalArgumentException](Warc.parseSegment(cut).toSeq)
    assert(e.getMessage.contains("truncated"))
  }
}
