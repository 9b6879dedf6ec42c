package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** All-pairs edit-distance-1 term discovery over the index dictionary —
  * the SymSpell-style deletion-neighborhood index SpellCorrect's Scaladoc
  * promises: typo/variant pairs for query expansion ("did-you-mean"
  * candidates precomputed for EVERY vocabulary term at once, not per
  * query).
  *
  * Scale shape: a naive all-pairs Levenshtein is |V|² — at web vocabulary
  * size that's unrunnable, and it's exactly what the DuckDB oracle runs at
  * test scale to prove this plan equal to it. Deletion neighborhoods make
  * it linear: every term emits its |term|+1 deletion variants (itself plus
  * each single-char deletion), candidates are pairs sharing a variant (an
  * equi-join on the variant string — one shuffle, no cross product), and a
  * cheap codegen'd `levenshtein` verify discards the false candidates the
  * shared-variant test admits (e.g. "ab"/"ba" share variant "b" at
  * distance 2). For distance 1 the candidate set is a guaranteed superset:
  * lev(s,t)<=1 means t = s, t = s minus a char (t is in D(s)), s = t minus
  * a char (s is in D(t)), or s,t differ by one substitution (deleting that
  * position from either lands on the same string). Verify-after-generate
  * keeps the result exact.
  *
  * The `minLen` floor keeps neighborhoods sparse (deleting from very short
  * terms funnels huge candidate groups through few variants — the classic
  * SymSpell hot bucket; at web scale you'd additionally salt the top
  * variants exactly like the index build salts head terms).
  */
object TermNeighbors {

  /** @param vocab columns `term` (string), `df` (long)
    * @return (term_a, term_b, df_a, df_b) with term_a < term_b and
    *         levenshtein(term_a, term_b) == 1 */
  def editDistance1(vocab: DataFrame, minLen: Int = 1): DataFrame = {
    require(minLen >= 1, s"minLen must be >= 1: $minLen")
    val v = vocab.select(col("term"), col("df"))
      .filter(length(col("term")) >= minLen)
    // index 0 keeps the term; index i in 1..len deletes char i. Pure
    // column exprs (sequence + transform + substr) — stays in codegen.
    val t = col("term")
    val variants = v.select(t, col("df"),
      explode(transform(
        sequence(lit(0), length(t)),
        i => when(i === 0, t).otherwise(
          concat(t.substr(lit(1), i - 1), t.substr(i + 1, length(t))))))
        .as("variant"))
    val a = variants.select(t.as("term_a"), col("df").as("df_a"),
      col("variant"))
    val b = variants.select(t.as("term_b"), col("df").as("df_b"),
      col("variant"))
    a.join(b, Seq("variant"))
      .filter(col("term_a") < col("term_b"))
      .select("term_a", "term_b", "df_a", "df_b")
      .dropDuplicates("term_a", "term_b")
      .filter(levenshtein(col("term_a"), col("term_b")) === 1)
  }
}
