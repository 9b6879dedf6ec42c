package graft.ml

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AbTestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("abtest-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def arm(u: Long): Long = PortableHash.h60(u.toString) % 2

  private def run(rows: Seq[(Long, String)]) =
    AbTest.zTest(rows.toDF("user_id", "event_type"),
        col("user_id"), lit(0L), col("event_type") === "click")
      .collect().toSeq

  test("counts split by the portable hash arm; z matches the literal formula") {
    // enough users that both arms are populated
    val rows = (0L until 40L).map { u =>
      (u, if (u % 3 == 0) "click" else "view")
    }
    val got = run(rows)
    assert(got.size == 1)
    val r = got.head
    val (n1, x1) = (rows.count(r0 => arm(r0._1) == 0).toLong,
      rows.count(r0 => arm(r0._1) == 0 && r0._2 == "click").toLong)
    val (n2, x2) = (rows.count(r0 => arm(r0._1) == 1).toLong,
      rows.count(r0 => arm(r0._1) == 1 && r0._2 == "click").toLong)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((n1, x1, n2, x2)))
    val p1 = x1.toDouble / n1; val p2 = x2.toDouble / n2
    val pp = (x1 + x2).toDouble / (n1 + n2)
    val z = (p1 - p2) / math.sqrt(pp * (1.0 - pp) * (1.0 / n1 + 1.0 / n2))
    assert(r.getDouble(8) == math.rint(z * 1e6) / 1e6)
    assert(r.getBoolean(9) == (math.abs(z) > 1.96))
  }

  test("no-effect data is not significant; strong effect is") {
    // same click rate in both arms → |z| small
    val flat = (0L until 200L).map(u => (u, if (u % 2 == 0) "click" else "view"))
    assert(!run(flat).head.getBoolean(9))
    // clicks only in one arm → |z| large
    val skewed = (0L until 200L).map { u =>
      (u, if (arm(u) == 1 && u % 2 == 0) "click" else "view")
    }
    assert(run(skewed).head.getBoolean(9))
  }

  test("degenerate cohort (zero pooled rate) yields NULL z, not NaN") {
    val none = (0L until 20L).map(u => (u, "view"))
    val r = run(none).head
    assert(r.isNullAt(8))
    assert(!r.getBoolean(9))
  }
}
