package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev utility: per-stage timing of the index build at two parallelism
  * levels, to attribute scaling loss to a stage.
  * Usage: runMain graft.tools.ScaleProbe [numDocs]
  */
object ScaleProbe {

  def stages(cpus: Int, n: Long): Unit = {
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  [$cpus] $name%-12s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val lex = spark.sparkContext.broadcast(graft.corpus.Corpus.lexicon)
    val pages = graft.corpus.Corpus.generate(spark, n)
    val ranged = pages.repartitionByRange(cpus, $"url").sortWithinPartitions($"url")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val counts = t("ranged")(ranged.mapPartitions(it =>
      Iterator.single((org.apache.spark.TaskContext.getPartitionId(), it.size.toLong))).collect())
    val offsets = { val m = new Array[Long](cpus); var acc = 0L
      for ((pid, c) <- counts.sortBy(_._1)) { m(pid) = acc; acc += c }; m }
    val offB = spark.sparkContext.broadcast(offsets)
    val postings = ranged.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var local = 0L
      it.flatMap { p =>
        val id = offB.value(pid) + local
        local += 1
        graft.text.Text.postings(p.url, new String(p.html, "UTF-8"), lex.value)
          .map { case (term, tf) => graft.index.TermPosting(term, id, tf) }
      }
    }
    t("tok_nopersist")(postings.count())
    val postingsP = postings.persist(StorageLevel.MEMORY_AND_DISK)
    t("tok_persist")(postingsP.count())
    val postingsD = ranged.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var local = 0L
      it.flatMap { p =>
        val id = offB.value(pid) + local
        local += 1
        graft.text.Text.postings(p.url, new String(p.html, "UTF-8"), lex.value)
          .map { case (term, tf) => graft.index.TermPosting(term, id, tf) }
      }
    }.persist(StorageLevel.DISK_ONLY)
    t("tok_disk")(postingsD.count())
    val postings2 = postingsP
    t("dict")(postings2.groupBy($"term").agg(count(lit(1)), max($"tf")).count())
    val termArr = postings2.select($"term").distinct().orderBy($"term")
      .collect().map(_.getString(0))
    val termOfB = spark.sparkContext.broadcast(termArr)
    val termDim = spark.createDataFrame(termArr.toIndexedSeq.zipWithIndex).toDF("term", "tid")
    t("blocks")(postings2
      .join(broadcast(termDim), Seq("term")).select($"tid", $"doc_id", $"tf")
      .repartitionByRange(cpus, $"tid".asc, $"tf".desc, $"doc_id".asc)
      .sortWithinPartitions($"tid".asc, $"tf".desc, $"doc_id".asc)
      .as[(Int, Long, Int)]
      .mapPartitions(it => graft.index.IndexBuild.encodeBlocks(it, 4096, termOfB.value))
      .count())
    val docIdUrl = ranged.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var local = 0L
      it.map { p => val id = offB.value(pid) + local; local += 1; (id, p.url) }
    }.toDF("doc_id", "url")
    t("docs")(docIdUrl.join(postings2.groupBy($"doc_id").agg(sum($"tf").as("dl")),
      Seq("doc_id"), "left").count())
    spark.stop()
  }

  def main(a: Array[String]): Unit = {
    val n = if (a.nonEmpty) a(0).toLong else 240000L
    println("warmup:"); stages(8, n / 8)
    println("measured:")
    stages(4, n)
    stages(16, n)
  }
}
