package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.Corpus
import graft.index.IndexBuild
import graft.query.Searcher

class StreamIngestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("stream-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming hourly event agg (watermarked) matches the batch answer") {
    // FileStreamSource needs a directory; stage the single-file table
    val src = Files.createTempDirectory("events").toString
    Files.copy(java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(src, "events.parquet"))
    val q = StreamIngest.eventsHourly(spark, src, "ev_hourly")
    q.awaitTermination(120000)
    val streamed = spark.sql("SELECT * FROM ev_hourly")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = spark.read.parquet(src)
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("sum_value"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streamed index ingest is rank-identical to the batch build; restart skips committed batches") {
    import spark.implicits._
    val numDocs = 200
    val base = Files.createTempDirectory("stream").toString
    val pagesDir = s"$base/pages"
    val segDir = s"$base/segments"
    val ckpt = s"$base/ckpt"
    // stage pages as multiple files so the stream sees several micro-batches
    Corpus.generate(spark, numDocs).repartition(6).write.parquet(pagesDir)

    val q1 = StreamIngest.indexIngest(spark, pagesDir, segDir, ckpt, Corpus.lexicon)
    q1.awaitTermination(240000)
    val batchesAfterFirst = new java.io.File(segDir).list().count(_.startsWith("batch="))
    assert(batchesAfterFirst >= 2, s"expected multiple micro-batches, got $batchesAfterFirst")

    val streamedIdx = StreamIngest.mergeStreamed(spark, segDir, parts = 4, blockSize = 64)
    val batchIdx = IndexBuild.build(spark, Corpus.generate(spark, numDocs),
      Corpus.lexicon, parts = 4, blockSize = 64)
    val sStream = Searcher.fromIndex(streamedIdx, numDocs)
    val sBatch = Searcher.fromIndex(batchIdx, numDocs)
    for (q <- Seq("galaxy", "galaxy engine search", "the", "prince officer soldier",
                  "running running galaxy"))
      assert(sStream.referenceTopK(q) == sBatch.referenceTopK(q), s"query '$q'")

    // restart with no new files: checkpoint ensures no batch re-runs
    val q2 = StreamIngest.indexIngest(spark, pagesDir, segDir, ckpt, Corpus.lexicon)
    q2.awaitTermination(120000)
    val batchesAfterRestart = new java.io.File(segDir).list().count(_.startsWith("batch="))
    assert(batchesAfterRestart == batchesAfterFirst, "restart must not re-ingest committed batches")
  }
}
