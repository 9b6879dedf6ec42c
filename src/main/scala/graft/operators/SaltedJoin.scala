package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-defusing inner equi-join: replicate the (broadcast-too-big, but
  * key-compact) right side `salts` ways and scatter left rows across salt
  * lanes with a deterministic row hash, so a hot key's rows land on `salts`
  * reducers instead of one. The result is EXACTLY a plain inner equi-join —
  * salting changes the partitioning, never the rows (spec + q80 oracle are
  * the plain join).
  *
  * When to reach for it: AQE's skew-join splitter already rescues
  * sort-merge joins at runtime, but it cannot help when the downstream
  * stage pins a hash partitioning (an aggregation on the join key), when
  * the join is shuffled-hash, or when the skew is in flight inside one
  * task's build side. Explicit salting is the declarative fix the index
  * build uses for head terms (SURVEY §2, salted repartition-by-term) —
  * this operator generalizes it to any fact-dim join.
  *
  * Cost: the right side is materialized `salts`× (keep salts small, 4-16;
  * the right side should be dim-sized, not fact-sized). The left-side salt
  * is a hash of the whole row, NOT a random: reruns and retries produce
  * identical lane assignment, so the join stays deterministic under task
  * retry exactly like every other op in this engine.
  */
object SaltedJoin {

  def inner(left: DataFrame, right: DataFrame, key: String,
            salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive: $salts")
    val lSalt = left.withColumn("_salt",
      pmod(xxhash64(struct(left.columns.toSeq.map(col): _*)), lit(salts))
        .cast("int"))
    val rSalt = right.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    lSalt.join(rSalt, Seq(key, "_salt")).drop("_salt")
  }
}
