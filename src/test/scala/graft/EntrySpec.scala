package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry() must return rows (the driver checks
  * rows > 0 at sf0.001). */
class EntrySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("entry-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("entry returns a non-empty ranked result") {
    val t0 = System.nanoTime()
    val rows = SparkEntry.entry(spark).collect()
    val dt = (System.nanoTime() - t0) / 1e9
    assert(rows.nonEmpty)
    assert(rows.head.schema.fieldNames.toSeq == Seq("rank", "url", "score"))
    // ranked 1..k with non-increasing scores
    assert(rows.map(_.getInt(0)).toSeq == (1 to rows.length))
    val scores = rows.map(_.getDouble(2)).toSeq
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    info(f"entry() produced ${rows.length} rows in $dt%.1fs")
  }

  test("every query has an oracle and every oracle has a query") {
    // a query without an oracle silently downgrades to the driver's
    // rows-only check; an orphan oracle is a typo'd name
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet,
      s"only-queries=${(SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet).toSeq.sorted}, " +
        s"only-oracles=${(SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).toSeq.sorted}")
  }
}
