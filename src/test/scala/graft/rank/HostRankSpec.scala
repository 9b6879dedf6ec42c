package graft.rank

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Host-graph derivation invariants + rank equality to a literal
  * single-threaded PageRank over the same host graph. */
class HostRankSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("host-rank-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("hostOf extracts the authority (port kept) and rejects garbage") {
    assert(HostRank.hostOf("http://a.example/p/1") == "a.example")
    assert(HostRank.hostOf("http://b.example:443/x") == "b.example:443")
    assert(HostRank.hostOf("https://c.example") == "c.example")
    assert(HostRank.hostOf("mailto:x@y") == null)
    assert(HostRank.hostOf("http:///nohost") == null)
  }

  private lazy val pages = graft.corpus.Corpus.generate(spark, 120)
  private lazy val state = HostRank.init(spark, pages).cache()

  test("host graph: one node per host, sorted distinct inter-host links, no self-loops") {
    val rows = state.collect()
    val hosts = rows.map(_.url)
    assert(hosts.distinct.length == hosts.length)
    rows.foreach { st =>
      assert(st.links == st.links.distinct.sorted, s"${st.url} links not sorted-distinct")
      assert(!st.links.contains(st.url), s"${st.url} has a self-loop")
      assert(st.rank == 1.0 && st.prev == 1.0)
    }
    // the 16-host corpus with its dangling.example outlink target
    assert(hosts.length == 16)
  }

  test("init is deterministic across parallelism") {
    val a = state.collect().sortBy(_.url).map(s => (s.url, s.links)).toSeq
    val b = HostRank.init(spark, pages.repartition(7)).collect()
      .sortBy(_.url).map(s => (s.url, s.links)).toSeq
    assert(a == b)
  }

  test("ranks equal a literal local PageRank over the same host graph") {
    val st = state.collect().sortBy(_.url)
    // literal reference algebra: keep-alive, 0.85*rank/outdeg to each
    // link, dangling mass dropped (inner join with the node set), +0.15
    val nodes = st.map(_.url).toSet
    var rank = st.map(s => s.url -> 1.0).toMap
    for (_ <- 1 to 7) {
      val mass = collection.mutable.Map.empty[String, Double].withDefaultValue(0.0)
      for (s <- st; l <- s.links if nodes.contains(l))
        mass(l) += 0.85 * rank(s.url) / s.links.length
      rank = st.map(s => s.url -> (mass(s.url) + 0.15)).toMap
    }
    val (got, iters) = HostRank.run(spark, state,
      threshold = -1.0, percent = 2.0, maxIter = 7)
    assert(iters == 7)
    got.collect().foreach { r =>
      assert(math.abs(r.rank - rank(r.url)) < 1e-9,
        s"${r.url}: got ${r.rank}, oracle ${rank(r.url)}")
    }
  }
}
