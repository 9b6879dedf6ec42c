package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native cosine expression must be bit-identical to the composed
  * higher-order-function column it replaced, stay inside whole-stage
  * codegen, and be callable from SQL via the session extension. */
class CosineSimilaritySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("cosine-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def composed(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)
    val n1 = aggregate(a, lit(0.0d), (acc, v) => acc + v * v)
    val n2 = aggregate(b, lit(0.0d), (acc, v) => acc + v * v)
    dot / (sqrt(n1) * sqrt(n2))
  }

  lazy val vecs = {
    val rng = new scala.util.Random(5)
    (0 until 200).map(i => (i.toLong,
      IndexedSeq.fill(64)(rng.nextGaussian()),
      IndexedSeq.fill(64)(rng.nextGaussian())))
  }.toDF("id", "a", "b")

  test("bit-identical to the composed aggregate/zip_with column") {
    val rows = vecs.select(
      GraftExtensions.cosineSim(col("a"), col("b")).as("native"),
      composed(col("a"), col("b")).as("old")).collect()
    assert(rows.length == 200)
    // exact double equality — same accumulation order by construction
    assert(rows.forall(r => r.getDouble(0) == r.getDouble(1)))
  }

  test("participates in whole-stage codegen (no interpreted fallback)") {
    // a bare local Seq collapses to LocalTableScan; repartition forces a
    // real codegen'd projection stage (AQE finalizes the plan on execute)
    val df = vecs.repartition(2)
      .select(GraftExtensions.cosineSim(col("a"), col("b")))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // AQE's final-plan rendering marks codegen stages with "*(n)"
    assert(plan.contains("WholeStageCodegen") || plan.contains("*(1) Project"), plan)
    val rows = vecs.repartition(2)
      .select(GraftExtensions.cosineSim(col("a"), col("b")).as("c"),
        composed(col("a"), col("b")).as("old")).collect()
    assert(rows.forall(r => r.getDouble(0) == r.getDouble(1)))
  }

  test("null array yields null; zero norm yields NaN") {
    val df = Seq(
      (Some(IndexedSeq(1.0, 0.0)), Some(IndexedSeq(1.0, 0.0))),
      (None, Some(IndexedSeq(1.0, 0.0))),
      (Some(IndexedSeq(0.0, 0.0)), Some(IndexedSeq(1.0, 0.0)))
    ).toDF("a", "b")
    val got = df.select(GraftExtensions.cosineSim(col("a"), col("b"))).collect()
    assert(got(0).getDouble(0) == 1.0)
    assert(got(1).isNullAt(0))
    assert(got(2).getDouble(0).isNaN)
  }

  test("LENGTH MISMATCH yields null, not a prefix cosine (eval + codegen)") {
    import spark.implicits._
    // a truncated embedding must not produce a plausible score that could
    // cross a dup threshold
    val df = Seq((Seq(1.0, 0.0, 0.0), Seq(1.0, 0.0))).toDF("a", "b")
    for (d <- Seq(df, df.repartition(2))) { // LocalTableScan eval + codegen
      val out = d.select(GraftExtensions.cosineSim(col("a"), col("b")).as("c")).collect()
      assert(out.head.isNullAt(0), s"expected null on mismatch, got ${out.head}")
    }
  }

  test("null ELEMENT yields null, like the composed column (eval + codegen)") {
    val df = Seq(
      (0L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0)),
      (1L, Seq[java.lang.Double](1.0, 0.0), Seq[java.lang.Double](1.0, 0.0))
    ).toDF("id", "a", "b")
    for (d <- Seq(df, df.repartition(2))) { // LocalTableScan eval + codegen
      val got = d.orderBy("id").select(
        GraftExtensions.cosineSim(col("a"), col("b")).as("native"),
        composed(col("a"), col("b")).as("old")).collect()
      assert(got(0).isNullAt(0) && got(0).isNullAt(1))
      assert(got(1).getDouble(0) == 1.0 && got(1).getDouble(1) == 1.0)
    }
  }

  test("registered as a SQL function via the session extension") {
    GraftExtensions.register(spark)
    vecs.createOrReplaceTempView("cos_vecs")
    val viaSql = spark.sql(
      "SELECT id, cosine_sim(a, b) AS c FROM cos_vecs ORDER BY id")
      .collect().map(_.getDouble(1))
    val viaCol = vecs.orderBy("id")
      .select(GraftExtensions.cosineSim(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(viaSql.sameElements(viaCol))
  }
}
