package graft.rank

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-node triangle counting over the link graph — the local clustering
  * signal a web-graph audit wants next to degree and PageRank (triangle
  * density separates organic link neighborhoods from link farms, whose
  * hub-and-spoke shape is triangle-poor for their degree).
  *
  * Shape: the classic degree-ORIENTED wedge join (Cohen's MapReduce
  * triangle counting / "node-iterator++"). Every undirected edge is
  * oriented from its lower-(degree, id) endpoint to the higher one, so the
  * oriented out-degree of ANY node — including a celebrity hub with 10^8
  * inlinks — is bounded by O(√m). Each triangle then has exactly one apex
  * with two outgoing oriented edges, so the wedge self-join emits each
  * candidate once, and per-wedge work is Σ outdeg² ≤ m^1.5 instead of the
  * Σ deg² blowup a naive adjacency join suffers on a power-law web graph.
  * All three joins (degree attach ×2, wedge close) are plain equi-joins on
  * node keys: they shuffle (node, node) pairs only, never adjacency lists,
  * and Catalyst/AQE pick sort-merge or broadcast per side size.
  *
  * Input may be directed, duplicated, or self-looped — it is canonicalized
  * (undirected, distinct, loop-free) first, so a crawl's reciprocal links
  * count one edge.
  */
object Triangles {

  /** @param edges edge list with columns `srcCol`, `dstCol`
    * @return (node, triangles) — one row per node in ≥1 triangle */
  def perNode(edges: DataFrame, srcCol: String = "src",
              dstCol: String = "dst"): DataFrame = {
    val und = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = und.select(col("a").as("node"))
      .unionAll(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val withDeg = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("u"),
      when(aFirst, col("b")).otherwise(col("a")).as("v"))
    // wedges at apex u, ordered v < w so each candidate pair appears once;
    // a wedge closes into a triangle iff (v, w) is a canonical edge
    val o2 = oriented.select(col("u"), col("v").as("w"))
    val wedges = oriented.join(o2, "u").filter(col("v") < col("w"))
    val triangles = wedges.join(und,
      wedges("v") === und("a") && wedges("w") === und("b"))
    triangles.select(col("u").as("node"))
      .unionAll(triangles.select(col("v").as("node")))
      .unionAll(triangles.select(col("w").as("node")))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
  }
}
