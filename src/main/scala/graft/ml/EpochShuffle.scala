package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic per-epoch corpus shuffling — the data-loader op between
  * shard balancing and training: every epoch must visit the corpus in a
  * DIFFERENT pseudo-random order, yet the order must be reproducible on
  * any engine and any parallelism (a training run resumed mid-epoch, or
  * re-run for a bit-exact repro, must see the same stream). Seeded
  * engine shuffles don't survive a repartition; a content-keyed hash
  * does: position = rank of md5("epoch:id") within the epoch.
  *
  * Scale shape: ids explode ×epochs (ids only — never text), then ONE
  * combined range sort over (epoch, key) assigns every epoch's
  * permutation in a single [[graft.util.GlobalRank]] pass; per-epoch
  * position falls out as combinedRank − epoch·N. md5 keys are uniform,
  * so the range partitions are skew-free by construction.
  */
object EpochShuffle {

  /** (idCol, epoch, pos) for every epoch in [0, epochs): `pos` is the
    * row's position in that epoch's deterministic permutation. */
  def permute(df: DataFrame, idCol: String, epochs: Int,
              parts: Int = 0): DataFrame = {
    require(epochs >= 1, s"epochs must be >= 1, got $epochs")
    val n = df.count()
    val keyed = df.select(col(idCol).cast("long").as("id"))
      .withColumn("epoch", explode(sequence(lit(0), lit(epochs - 1))))
      .withColumn("key",
        md5(concat(col("epoch").cast("string"), lit(":"),
          col("id").cast("string"))))
    graft.util.GlobalRank
      .zipWithRank(keyed,
        Seq(col("epoch").asc, col("key").asc, col("id").asc),
        rankCol = "crank", parts = parts)
      .select(col("id").as(idCol), col("epoch"),
        (col("crank") - col("epoch").cast("long") * n).as("pos"))
  }
}
