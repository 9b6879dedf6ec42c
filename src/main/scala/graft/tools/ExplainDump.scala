package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dev utility for the optimization rounds: dumps `.explain("formatted")`
  * of named SparkEntry queries to text files (the plan-evidence artifacts
  * under plans/rNN/). Runs each query function (side-effect dumps included,
  * exactly as Bench/Verify would) but only EXPLAINS the returned frame —
  * no action on it.
  *
  * Usage: runMain graft.tools.ExplainDump <sfDir> <outDir> <suffix> q32_pagerank,q68_hits,...
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 4, "args: <sfDir> <outDir> <suffix> <comma-names>")
    val Array(sfDir, outDir, suffix, namesCsv) = args
    val names = namesCsv.split(",").map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val qmap = graft.SparkEntry.queries.toMap
    for (n <- names) {
      val df = qmap(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"${n}_$suffix.txt"),
        txt.getBytes(StandardCharsets.UTF_8))
      System.err.println(s"[explain] wrote $n ($suffix)")
    }
    spark.stop()
  }
}
