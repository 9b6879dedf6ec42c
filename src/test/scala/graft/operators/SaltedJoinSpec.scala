package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salting must change the partitioning, never the rows. */
class SaltedJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("salted-join-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("salted inner join == plain inner join, skewed keys included") {
    import spark.implicits._
    // key 1 holds 80% of the fact rows — the skew case salting exists for
    val fact = ((1 to 800).map(i => (i.toLong, 1L)) ++
      (801 to 1000).map(i => (i.toLong, (i % 7 + 2).toLong)))
      .toDF("row_id", "k")
    val dim = (1 to 9).map(i => (i.toLong, s"label$i")).toDF("k", "label")
    val salted = SaltedJoin.inner(fact, dim, "k", salts = 8)
      .select("row_id", "k", "label")
      .collect().map(_.toString).sorted
    val plain = fact.join(dim, Seq("k")).select("row_id", "k", "label")
      .collect().map(_.toString).sorted
    assert(salted.sameElements(plain))
    assert(salted.length == 1000)
  }

  test("deterministic across reruns and partitionings; no _salt leaks out") {
    import spark.implicits._
    val fact = (1 to 300).map(i => (i.toLong, (i % 5).toLong)).toDF("row_id", "k")
    val dim = (0 to 4).map(i => (i.toLong, i * 10)).toDF("k", "v")
    val out = SaltedJoin.inner(fact, dim, "k", salts = 4)
    assert(!out.columns.contains("_salt"))
    val a = out.collect().map(_.toString).sorted
    val b = SaltedJoin.inner(fact.repartition(11), dim, "k", salts = 4)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }
}
