package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A/B experiment readout — the analysis layer next to the position-bias
  * click model (q126) and team-draft interleaving (q138): per cohort, the
  * two-proportion z-test on success rates between control and treatment,
  *
  *   z = (p₁ − p₂) / √( p̂(1−p̂)(1/n₁ + 1/n₂) ),  p̂ pooled
  *
  * with the standard |z| > 1.96 two-sided 5% significance flag. Arms are
  * assigned by the portable hash of the unit id (deterministic,
  * SQL-replayable — the same property the HRW placement and LSH bands
  * rely on), so assignment is consistent across recomputations and
  * engines with no stored assignment table.
  *
  * Determinism contract: all counts are exact integers; p₁/p₂/p̂ are
  * single divisions; sqrt is IEEE-correctly-rounded on both engines; z
  * is rounded 6dp round-even. Degenerate cohorts (pooled rate 0 or 1, or
  * an empty arm) yield NULL z and false significance on both sides.
  *
  * Scale shape: one map-side-combined aggregation over the event log —
  * the readout is cohort-count-sized regardless of log size; nothing
  * else moves.
  */
object AbTest {

  /** @param events   unit-level log rows
    * @param unitCol  experiment unit (hashed to an arm)
    * @param cohortCol segment expression (readout row per cohort)
    * @param success  boolean success expression (e.g. clicked)
    * @return (cohort, n_control, x_control, n_treat, x_treat,
    *          p_control, p_treat, lift, z, significant) */
  def zTest(events: DataFrame, unitCol: Column, cohortCol: Column,
            success: Column): DataFrame = {
    val arm = Sketches.h60(unitCol) % 2 // 0 = control, 1 = treatment
    val s = success.cast("boolean")
    val agg = events.select(cohortCol.as("cohort"), arm.as("arm"), s.as("s"))
      .groupBy(col("cohort"))
      .agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_control"),
        sum(when(col("arm") === 0 && col("s"), 1L).otherwise(0L)).as("x_control"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_treat"),
        sum(when(col("arm") === 1 && col("s"), 1L).otherwise(0L)).as("x_treat"))
    val n1 = col("n_control").cast("double")
    val n2 = col("n_treat").cast("double")
    // empty arms yield NULL rates, never IEEE inf/NaN artifacts
    val p1 = when(col("n_control") > 0, col("x_control").cast("double") / n1)
    val p2 = when(col("n_treat") > 0, col("x_treat").cast("double") / n2)
    val pp = (col("x_control") + col("x_treat")).cast("double") /
      (col("n_control") + col("n_treat")).cast("double")
    val se = sqrt(pp * (lit(1.0) - pp) * (lit(1.0) / n1 + lit(1.0) / n2))
    val z = when(col("n_control") > 0 && col("n_treat") > 0 && se > 0,
      (p1 - p2) / se)
    def r6(c: Column) = bround(c * 1e6, 0) / 1e6
    agg.select(col("cohort"),
        col("n_control"), col("x_control"), col("n_treat"), col("x_treat"),
        r6(p1).as("p_control"), r6(p2).as("p_treat"),
        r6(p1 - p2).as("lift"), r6(z).as("z"),
        coalesce(abs(z) > lit(1.96), lit(false)).as("significant"))
      .orderBy(col("cohort"))
  }
}
