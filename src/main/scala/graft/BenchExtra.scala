package graft

import org.apache.spark.sql.SparkSession

/** Extra benchmarks for the optimization rounds (guide §1.4) — NOT part of
  * the driver contract ([[Bench]] is frozen and remains the canonical
  * artifact). Times a NAMED SUBSET of SparkEntry queries with exactly the
  * methodology of Bench section 1 (same session config, same untimed
  * warmup, `.count()` action), so subset timings are comparable to the
  * full suite's per-query numbers. Prints one JSON line.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     runMain graft.BenchExtra q32_pagerank,q135_trustrank[,...]
  *   (name "all" runs the whole suite)
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val names: Seq[String] =
      if (args.isEmpty || args(0) == "all") SparkEntry.queries.keys.toSeq
      else args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count()
    catch { case e: Throwable => System.err.println(s"[bench-extra] warmup failed: ${e.getMessage}") }
    val qmap = SparkEntry.queries.toMap
    val results = names.map { name =>
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      val ok =
        try { qmap(name)(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench-extra] $name FAILED: ${e.getMessage}"); false
        }
      val dt = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      System.err.println(f"[bench-extra] $name%-26s $dt%8.2fs")
      name -> dt
    }
    spark.stop()
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"extra","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
  }
}
