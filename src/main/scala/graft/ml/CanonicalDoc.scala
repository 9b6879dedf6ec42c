package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Canonical-representative selection — the curation pass that follows
  * near-dup cluster formation ([[Dedup.connectedComponents]], q47): every
  * document maps to its cluster's ONE canonical copy ("longest version
  * wins", doc-id-asc ties — the keep-the-fullest-copy rule real dedup
  * pipelines apply), singletons map to themselves, and downstream
  * training-mix builders keep `is_canonical` rows while redirect tables
  * keep the full map. [[graft.query.Redirects]]-style chains cannot arise:
  * canonical ids are fixpoints by construction.
  *
  * Deterministic: preference is (text length desc, doc_id asc) — integers
  * only, so the survivor map is hash-exact against the oracle with no
  * float convention at all.
  *
  * Scale shape: the map is one shuffle on the component key over
  * (id, comp, len) longs — text never moves; the per-cluster window is
  * partitioned by component (clusters are near-dup-sized, not
  * corpus-sized); singletons take the left-join's null branch and never
  * enter the window shuffle's skew path.
  */
object CanonicalDoc {

  /** @param docs       (idCol, lenCol) — one row per document
    * @param components (idCol, compCol) — cluster membership, docs absent
    *                   here are singletons
    * @return (doc_id, canonical_id, is_canonical) for EVERY doc in `docs` */
  def survivorMap(docs: DataFrame, components: DataFrame,
                  idCol: String = "doc_id", lenCol: String = "len",
                  compCol: String = "component"): DataFrame = {
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
        col(lenCol).cast("long").as("len"))
      .join(components.select(col(idCol).cast("long").as("doc_id"),
        col(compCol).cast("long").as("comp0")), Seq("doc_id"), "left")
      .select(col("doc_id"), col("len"),
        coalesce(col("comp0"), col("doc_id")).as("comp"))
    val w = Window.partitionBy(col("comp"))
      .orderBy(col("len").desc, col("doc_id").asc)
    val canon = base.withColumn("rnk", row_number().over(w))
      .where(col("rnk") === 1)
      .select(col("comp"), col("doc_id").as("canonical_id"))
    base.join(canon, Seq("comp"))
      .select(col("doc_id"), col("canonical_id"),
        (col("doc_id") === col("canonical_id")).as("is_canonical"))
  }
}
