package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DeepWalk-style random-walk corpus generation (Perozzi et al., KDD
  * 2014) — the training-data op that turns the link graph into "sentences"
  * for embedding training: W walks per start node, each of length L,
  * stepping to a uniformly-hashed out-neighbor. The walk corpus then
  * feeds the same sequence-packing/shuffling ops documents do (q48/q124).
  *
  * Steps are DERANDOMIZED with the portable hash: from node v on walk w
  * at step s, the successor is sortedNeighbors(v)[ h60("v|w|s") mod
  * outdeg(v) ] — no RNG state, reproducible at any parallelism, and
  * SQL-replayable (the oracle re-walks every path with a recursive CTE).
  * Dead-end nodes simply end their walks early (the standard DeepWalk
  * choice).
  *
  * Scale shape: adjacency is one (src)-keyed agg (sorted DISTINCT
  * neighbor lists — the degree-bounded rows a link graph already has);
  * each of the L rounds is one equi-join of the walk frontier against
  * adjacency on the current node — walk state is (start, wid, step, cur)
  * ids only, never payloads; output accumulates by union. L and W are
  * small constants; nothing is quadratic and nothing transits the driver.
  */
object GraphWalks {

  /** @param edges    (src, dst) directed link graph (dups collapsed)
    * @param starts   (node) walk start set — usually every node
    * @param numWalks walks per start node
    * @param length   steps per walk (output has ≤ length+1 rows per walk)
    * @return (start, wid, step, node) — the walk corpus */
  def walks(spark: SparkSession, edges: DataFrame, starts: DataFrame,
            numWalks: Int, length: Int): DataFrame = {
    require(numWalks >= 1 && length >= 1,
      s"need positive walk count/length: $numWalks/$length")
    import spark.implicits._

    val adj = edges.select(col("src"), col("dst")).distinct()
      .groupBy(col("src"))
      .agg(sort_array(collect_set(col("dst"))).as("nbrs"))

    val wids = spark.range(numWalks.toLong)
      .select(col("id").cast("int").as("wid"))
    var state = starts.select(col("node").as("start"))
      .crossJoin(broadcast(wids))
      .select(col("start"), col("wid"), lit(0).as("step"),
        col("start").as("cur"))
    var out = state
    for (s <- 1 to length) {
      val key = concat(col("cur"), lit("|"), col("wid").cast("string"),
        lit("|"), lit((s - 1).toString))
      state = state.join(adj, state("cur") === adj("src"))
        .select(col("start"), col("wid"), lit(s).as("step"),
          element_at(col("nbrs"),
            ((Sketches.h60(key) % size(col("nbrs"))) + 1).cast("int"))
            .as("cur"))
      out = out.unionByName(state)
    }
    out.select(col("start"), col("wid"), col("step"), col("cur").as("node"))
  }
}
