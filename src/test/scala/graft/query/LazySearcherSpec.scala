package graft.query

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.Corpus
import graft.index.IndexBuild

/** The point-lookup serving tier must (a) return EXACTLY the eager
  * searcher's results for both scorers, and (b) actually prune: a query must
  * read far fewer bytes than the persisted index holds, with the term
  * predicate pushed into the parquet scan.
  */
class LazySearcherSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("lazy-searcher-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val numDocs = 300

  lazy val (dir, eager) = {
    val d = Files.createTempDirectory("lazyidx").toString
    val built = IndexBuild.build(spark, Corpus.generate(spark, numDocs),
      Corpus.lexicon, parts = 8, blockSize = 64)
    IndexBuild.save(spark, built, d)
    (d, Searcher.fromIndex(built, numDocs))
  }

  def queries: Seq[String] =
    scala.io.Source.fromInputStream(getClass.getResourceAsStream("/queries.txt"), "UTF-8")
      .getLines().toVector

  test("lazy point-lookup serving is identical to the eager searcher") {
    // both docs-fetch strategies: In-filter pushdown (default) and the
    // broadcast-id-join fallback for large id sets (threshold 0 forces it)
    for (threshold <- Seq(2048, 0)) {
      val lazySearcher = new LazySearcher(spark, dir, numDocs, isinThreshold = threshold)
      for (q <- queries) {
        assert(lazySearcher.referenceTopK(q) == eager.referenceTopK(q), s"ref '$q' t=$threshold")
        assert(lazySearcher.bm25TopK(q, 10) == eager.bm25TopK(q, 10), s"bm25 '$q' t=$threshold")
      }
    }
  }

  test("term predicate is pushed into the blocks parquet scan") {
    import org.apache.spark.sql.functions.col
    val blocks = graft.tables.TableIO.read(spark, s"$dir/blocks")
    val plan = blocks.filter(col("term").isin("galaxy", "galaxi"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(term"),
      s"expected term In-filter pushed to parquet:\n$plan")
  }

  test("a one-term query reads a small fraction of the index bytes") {
    def dirBytes(p: String): Long =
      Files.walk(Paths.get(p)).iterator().asInstanceOf[java.util.Iterator[Path]]
        .asScala.filter(f => Files.isRegularFile(f) && f.toString.endsWith(".parquet"))
        .map(Files.size).sum
    val indexBytes = dirBytes(s"$dir/blocks") + dirBytes(s"$dir/docs")

    val lazySearcher = LazySearcher.open(spark, dir, numDocs) // stats jobs outside the window
    @volatile var bytesRead = 0L
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) bytesRead += t.taskMetrics.inputMetrics.bytesRead
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      lazySearcher.referenceTopK("galaxy")
      // listener events are posted asynchronously; give the bus a moment
      Thread.sleep(1500)
    } finally spark.sparkContext.removeSparkListener(listener)

    assert(bytesRead > 0, "listener must observe the point-lookup reads")
    assert(bytesRead < indexBytes / 2,
      s"query read $bytesRead of $indexBytes index bytes — blocks scan is not pruned")
  }

  private implicit class IterOps[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }
}
