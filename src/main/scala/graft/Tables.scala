package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table access for the driver contract queries.
  *
  * All driver-verified queries read the driver-generated parquet tables in
  * `sfDir` (see /root/repo/TESTDATA.md). Reading through one helper keeps the
  * scan declarative so Catalyst pushes filters/projections into the parquet
  * scan (verified via `.explain("formatted")` — `PushedFilters`/`ReadSchema`).
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
