package graft.tables

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A join of two same-bucketed tables must plan with ZERO Exchange nodes
  * and return exactly the unbucketed join's rows; the unbucketed twin must
  * plan WITH exchanges (so the assertion actually proves co-location). */
class BucketingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("bucketing-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("bucketed join: no Exchange, identical rows") {
    import spark.implicits._
    val tag = System.nanoTime()
    val facts = (1 to 500).map(i => (i.toLong % 97L, s"f$i")).toDF("k", "payload")
    val dims = (0 until 97).map(i => (i.toLong, s"d$i")).toDF("k", "name")
    Bucketing.writeBucketed(facts, s"bspec_facts_$tag", "k", 8)
    Bucketing.writeBucketed(dims, s"bspec_dims_$tag", "k", 8)

    val joined = Bucketing.bucketedJoin(spark,
      s"bspec_facts_$tag", s"bspec_dims_$tag", "k", "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
    assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")

    val expected = facts.as("l").hint("merge")
      .join(dims.as("r"), col("l.k") === col("r.k"))
      .select(col("l.k"), col("payload"), col("name"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val got = joined.select(joined("payload"), joined("name"),
        spark.table(s"bspec_facts_$tag")("k"))
      .collect().map(r => (r.getLong(2), r.getString(0), r.getString(1))).toSet
    assert(got == expected && got.size == 500)

    // the unbucketed twin DOES exchange — proves the assertion has teeth
    val unbucketed = facts.hint("merge").join(dims, "k")
    assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("bucketed groupBy on the bucket key aggregates without exchange") {
    import spark.implicits._
    val tag = System.nanoTime()
    val facts = (1 to 300).map(i => (i.toLong % 13L, i.toLong)).toDF("k", "v")
    Bucketing.writeBucketed(facts, s"bspec_agg_$tag", "k", 4)
    val agg = spark.table(s"bspec_agg_$tag").groupBy("k").agg(sum("v").as("s"))
    assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
    val got = agg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (1 to 300).groupBy(_ % 13).map { case (k, xs) =>
      k.toLong -> xs.map(_.toLong).sum }
    assert(got == want)
  }
}
