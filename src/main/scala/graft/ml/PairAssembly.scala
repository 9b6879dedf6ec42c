package graft.ml

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal training-pair assembly — the step that turns a text corpus
  * and a media-asset store into (caption, media) training pairs for
  * CLIP-style contrastive pre-training:
  *
  *  1. equi-join captions to assets on the pairing key (a hash join on
  *     ids — media BYTES never shuffle: only their fingerprints do, the
  *     same discipline as the decode pipeline);
  *  2. quality-gate the caption ([[TextAnalysis.qualityScore]] ≥ a
  *     threshold — a garbage caption poisons the pair, not just itself);
  *  3. exact-dedup on the (caption-md5, media-md5) CONTENT pair — the
  *     same page re-crawled under two urls must not weight the pair
  *     twice; keep the smallest id per content pair (deterministic).
  */
object PairAssembly {

  /** Assemble pairs from `captions` (id, text) and `assets`. `pairKey`
    * maps a caption id to its asset id. Returns one row per surviving
    * pair: (pair_id = min surviving caption id, asset_id, kind,
    * caption_md5, media_md5, quality). */
  def assemble(captions: DataFrame, assets: Dataset[MediaAsset],
               minQuality: Double): DataFrame = {
    val spark = captions.sparkSession
    val caps = captions
      .select(col("id").cast("long").as("cap_id"), col("text"))
      .withColumn("quality", TextAnalysis.qualityScore(col("text")))
      .where(col("quality") >= minQuality)
      .withColumn("caption_md5", md5(col("text")))
      .drop("text")
    val media = assets.toDF()
      .select(col("asset_id"), col("kind"), md5(col("media")).as("media_md5"))
    caps.join(media, caps("cap_id") === media("asset_id"))
      .groupBy(col("caption_md5"), col("media_md5"))
      .agg(min(col("cap_id")).as("pair_id"),
        min(col("asset_id")).as("asset_id"),
        // min, not first: every agg must be order-independent (kind and
        // quality are content-determined within a group anyway)
        min(col("kind")).as("kind"),
        min(col("quality")).as("quality"))
      .select(col("pair_id"), col("asset_id"), col("kind"),
        col("caption_md5"), col("media_md5"), col("quality"))
  }
}
