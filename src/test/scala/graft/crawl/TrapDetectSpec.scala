package graft.crawl

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class TrapDetectSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("trap-detect-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("flags unbounded-shape buckets, collapses ALL digit runs, drops repeats") {
    import spark.implicits._
    val trap = (0 until 60).map(i => s"http://t.example/cal/2026/$i/day$i")
    // an archive that re-fetches the SAME 5 urls 12 times each: big
    // bucket, low distinct fraction → NOT a trap
    val archive = (0 until 60).map(i => s"http://a.example/page/${i % 5}")
    val small = Seq("http://s.example/one/1", "http://s.example/two/2")
    val got = TrapDetect.urlTemplates(
        (trap ++ archive ++ small).toDF("url"), "url", minCount = 50)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("t.example", "/cal/N/N/dayN", 60L)))
  }

  test("a bare-host url templates to '/' and ordering is (n desc, host, template)") {
    import spark.implicits._
    val urls = (0 until 30).map(_ => "http://b.example") ++
      (0 until 30).map(i => s"http://a.example/x/$i")
    val got = TrapDetect.urlTemplates(urls.toDF("url"), "url",
        minCount = 20, minDistinctFrac = 0.0)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq == Seq(("a.example", "/x/N"), ("b.example", "/")))
    // bare-host bucket has 30 urls but 1 distinct — the default 0.99
    // distinct fraction would (correctly) drop it
  }
}
