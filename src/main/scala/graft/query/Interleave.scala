package graft.query

import scala.collection.mutable
import org.apache.spark.sql.DataFrame

/** Team-draft interleaving (Radlinski, Kurup, Joachims, CIKM 2008) — the
  * online A/B evaluation op: two rankers' result lists for the same query
  * are merged like schoolyard team picking, users see ONE list, and which
  * team's picks get clicked decides the winner without splitting traffic.
  *
  * Per query: teams alternate drafting their highest-ranked not-yet-picked
  * url; the team with fewer picks drafts next, ties broken by a
  * DETERMINISTIC coin — the portable md5 h60 of "query|round" — so any
  * engine (and the serving tier replaying a logged experiment) reproduces
  * the exact interleaved list; a team whose list is exhausted cedes its
  * turns.
  *
  * Scale shape: one shuffle keyed on query_id over (id, url, rank) rows;
  * each group is ≤ 2k urls and the draft is O(k²) string lookups on it —
  * constant per query, embarrassingly parallel across queries. No state,
  * no driver transit beyond the result.
  */
object Interleave {

  /** @param runs columns (query_id INT, system STRING, url STRING,
    *             rank INT) — rank 1-based within (query_id, system);
    *             exactly the two named systems are drafted
    * @return (query_id, pos, url, team): the interleaved top-`k`, team =
    *         the system whose draft pick the url was */
  def teamDraft(runs: DataFrame, sysA: String, sysB: String,
                k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(sysA != sysB, s"need two distinct systems, got '$sysA' twice")
    val spark = runs.sparkSession
    import spark.implicits._
    val ds = runs.selectExpr("cast(query_id as int) query_id", "system",
        "url", "cast(rank as int) rank")
      .as[(Int, String, String, Int)]
    ds.groupByKey(_._1).flatMapGroups { (qid, it) =>
      val rows = it.toSeq
      val a = rows.filter(_._2 == sysA).sortBy(_._4).map(_._3)
      val b = rows.filter(_._2 == sysB).sortBy(_._4).map(_._3)
      val picked = mutable.HashSet.empty[String]
      val out = mutable.ArrayBuffer.empty[(String, String)]
      var na = 0
      var nb = 0
      var done = false
      while (!done && out.size < k) {
        val nxa = a.find(!picked.contains(_))
        val nxb = b.find(!picked.contains(_))
        if (nxa.isEmpty && nxb.isEmpty) done = true
        else {
          // fewer-picks team drafts; equal counts flip the deterministic
          // coin for round na (== nb); an exhausted team cedes its turn
          val aDrafts =
            if (nxa.isEmpty) false
            else if (nxb.isEmpty) true
            else if (na != nb) na < nb
            else graft.ml.PortableHash.h60(s"$qid|$na") % 2 == 0
          val u = if (aDrafts) nxa.get else nxb.get
          if (aDrafts) na += 1 else nb += 1
          picked += u
          out += ((u, if (aDrafts) sysA else sysB))
        }
      }
      out.iterator.zipWithIndex.map { case ((u, t), i) => (qid, i + 1, u, t) }
    }.toDF("query_id", "pos", "url", "team")
  }
}
