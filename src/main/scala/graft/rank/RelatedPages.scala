package graft.rank

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bibliographic coupling over the link graph: two pages are related when
  * they cite the same targets, scored by their shared-outlink count. The
  * third link-analysis scorer next to PageRank (q32) and HITS (q68) —
  * coupling is the static "related pages" signal that needs no iteration.
  *
  * Plan: distinct edges, then a self-equi-join on the shared TARGET and a
  * count per source pair. The join is quadratic per target, so hub targets
  * are dropped BEFORE the join: a dst cited by more than `maxIndegree`
  * sources contributes O(indegree²) pairs and near-zero signal (everyone
  * cites it — same rationale as the LSH bucket caps in Dedup and the hub
  * cap in AnchorText). With the cap, shuffle volume is bounded by
  * Σ min(indegree, cap)² over targets — linear-ish in edges for web-shaped
  * (power-law) graphs at any corpus size.
  */
object RelatedPages {

  /** Co-citation — coupling's dual: two pages are related when the same
    * SOURCES cite them both (cited together ≙ related, the classic
    * "people who link to X also link to Y"). Exactly bibliographic
    * coupling on the TRANSPOSED graph, so the one implementation serves
    * both: the hub cap becomes a max-OUTDEGREE cap on the citing page (a
    * page citing everything pairs its targets quadratically with
    * near-zero signal). Returns (url1, url2, shared) ranked. */
  def coCitation(edges: DataFrame, maxOutdegree: Int, k: Int): DataFrame =
    biblioCoupling(
      edges.select(col("dst").as("src"), col("src").as("dst")),
      maxOutdegree, k)
      .select(col("src1").as("url1"), col("src2").as("url2"), col("shared"))

  /** Top-k (src1, src2, shared) pairs, shared desc, src-asc ties. */
  def biblioCoupling(edges: DataFrame, maxIndegree: Int, k: Int): DataFrame = {
    require(maxIndegree > 0 && k > 0, s"bad caps: $maxIndegree, $k")
    val e = edges.select(col("src"), col("dst")).distinct()
    val keptTargets = e.groupBy("dst")
      .agg(count(lit(1)).as("_ind"))
      .filter(col("_ind") <= maxIndegree)
      .select("dst")
    val kept = e.join(keptTargets, Seq("dst"))
    kept.as("a").join(kept.as("b"),
        col("a.dst") === col("b.dst") && col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("src1"), col("b.src").as("src2"))
      .agg(count(lit(1)).as("shared"))
      .orderBy(col("shared").desc, col("src1").asc, col("src2").asc)
      .limit(k)
  }
}
