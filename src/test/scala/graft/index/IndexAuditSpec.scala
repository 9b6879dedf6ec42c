package graft.index

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The audit must pass a healthy index and catch block corruption and
  * dictionary drift. */
class IndexAuditSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("index-audit-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val built = IndexBuild.build(spark,
    graft.corpus.Corpus.generate(spark, 200), graft.corpus.Corpus.lexicon,
    parts = 4)

  test("healthy index: every verdict true, stats match a triples recompute") {
    import spark.implicits._
    val rows = IndexAudit.audit(built, k = 50).collect()
    assert(rows.length == 50)
    assert(rows.forall(_.getBoolean(3)), "healthy index must audit clean")
    val lex = spark.sparkContext.broadcast(graft.corpus.Corpus.lexicon)
    val truth = graft.corpus.Corpus.generate(spark, 200).flatMap { p =>
      graft.text.Text.postings(p.url, new String(p.html, "UTF-8"), lex.value)
        .map { case (t, tf) => (t, tf) }
    }.toDF("term", "tf").groupBy("term")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("df"),
        org.apache.spark.sql.functions.max("tf").as("max_tf"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    rows.foreach { r =>
      val (df, maxTf) = truth(r.getString(0))
      assert(r.getLong(1) == df && r.getInt(2) == maxTf,
        s"${r.getString(0)}: audit stats drifted from the tokenizer truth")
    }
  }

  test("a lying block-max fails that term's verdict, others stay clean") {
    import spark.implicits._
    val victim = built.dictionary.orderBy($"df".desc).head().term
    val tampered = built.blocks.map { b =>
      if (b.term == victim && b.seq == 0) b.copy(max_tf = b.max_tf + 1) else b
    }
    val audit = IndexAudit.audit(
      BuiltIndex(built.docs, built.dictionary, tampered), k = 1000)
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(!audit(victim), "tampered block-max must fail the verdict")
    assert(audit.count(!_._2) == 1, "only the tampered term may fail")
  }

  test("dictionary drift (wrong df) fails that term's verdict") {
    import spark.implicits._
    val victim = built.dictionary.orderBy($"df".desc).head().term
    val drifted = built.dictionary.map(d =>
      if (d.term == victim) d.copy(df = d.df + 1) else d)
    val audit = IndexAudit.audit(
      BuiltIndex(built.docs, drifted, built.blocks), k = 1000)
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(!audit(victim))
    assert(audit.count(!_._2) == 1)
  }
}
