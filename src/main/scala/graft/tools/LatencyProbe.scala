package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility for the direct-tier latency work: builds the scaling
  * corpus index once, writes the DirectIndex sidecar, and times each bench
  * query's bm25TopK / referenceTopK per repetition — so first-run cost
  * (what p95 actually measures) is attributable per query.
  * Usage: runMain graft.tools.LatencyProbe [numDocs] [reps]
  */
object LatencyProbe {
  private val benchQueries = Seq(
    "galaxy", "galaxy engine search", "running", "abilities",
    "The,GALAXY-Engine!", "the", "of and the", "zzzabsentterm", "999 1234",
    "12 station", "prince officer soldier", "distributed storage system",
    "compression encoding decoder", "running running galaxy", "history")

  def main(args: Array[String]): Unit = {
    val numDocs = if (args.length > 0) args(0).toLong else 500000L
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-latency-probe")
      .config("spark.sql.shuffle.partitions", (cpus * 2).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val built = graft.index.IndexBuild.build(spark,
      graft.corpus.Corpus.generate(spark, numDocs, slices = Some(cpus * 2)),
      graft.corpus.Corpus.lexicon, parts = cpus * 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-latency").toFile.getAbsolutePath
    try {
      graft.query.DirectIndex.write(built, dir)
      spark.stop()
      val ds = graft.query.DirectSearcher.open(dir, numDocs.toInt)
      benchQueries.foreach(ds.referenceTopK(_)) // same warm rule as Bench
      for (r <- 1 to reps) {
        System.err.println(s"-- rep $r (bm25)")
        for (q <- benchQueries) {
          val t0 = System.nanoTime()
          ds.bm25TopK(q, 10)
          val ms = (System.nanoTime() - t0) / 1e6
          System.err.println(f"  $ms%8.2f ms  $q")
        }
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }
}
