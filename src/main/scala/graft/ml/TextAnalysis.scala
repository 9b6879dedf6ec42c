package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.util.hashing.MurmurHash3

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. Column-first
  * (codegen'd built-ins) where possible; pure Scala functions (narrow maps)
  * for the heuristics SQL can't express.
  */
object TextAnalysis {

  // ------------------------------------------------------------ token counts
  /** Whitespace token count (codegen'd). */
  def wsTokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0)
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword count: word pieces + digits + punctuation singletons
    * (a cheap proxy for tokenizer cost estimation at corpus scale). */
  private val bpeIsh = "[a-zA-Z]{1,4}|[0-9]|[^a-zA-Z0-9\\s]"

  def bpeIshTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeIsh), lit(0)))

  // --------------------------------------------------------------- quality
  // derived from stopwords("en") below — ONE English stopword list; under
  // \b anchors the alternation order is irrelevant to the match set
  private lazy val enStop = stopwords("en").toSeq.sorted.mkString("\\b(", "|", ")\\b")

  def stopwordCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(enStop), lit(0)))

  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0)
      .otherwise(size(regexp_extract_all(text, lit("[^a-zA-Z0-9\\s]"), lit(0)))
        .cast("double") / length(text))

  /** Composite quality score in [0,1]: length band + stopword density +
    * punctuation sanity (the C4/Gopher-style cheap filters). */
  def qualityScore(text: Column): Column = {
    val nTok = wsTokenCount(text).cast("double")
    val lenOk = when(nTok.between(10, 10000), 1.0).otherwise(0.0)
    val stopDensity = when(nTok === 0, 0.0).otherwise(stopwordCount(text) / nTok)
    val stopOk = when(stopDensity > 0.05, 1.0).otherwise(stopDensity * 20)
    val punctOk = when(punctRatio(text) < 0.2, 1.0).otherwise(0.0)
    round((lenOk + stopOk + punctOk) / 3.0, 4)
  }

  // ---------------------------------------------------------------- lang id
  /** Stopword families for 8 languages (+ 'und' fallback). MIRRORED
    * verbatim in the q28 oracle SQL — any edit here must edit both. */
  private val stopwords: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "in", "is", "was", "for", "that", "with", "it", "on", "as"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "für", "auf", "von"),
    "fr" -> Set("le", "la", "les", "et", "est", "une", "dans", "pour", "que", "qui", "des", "du"),
    "es" -> Set("el", "la", "los", "las", "es", "una", "para", "que", "con", "por", "del", "en"),
    "it" -> Set("il", "lo", "di", "che", "non", "un", "una", "per", "sono", "come", "anche", "più"),
    "pt" -> Set("o", "os", "as", "um", "uma", "não", "com", "do", "da", "em", "são", "mais"),
    "nl" -> Set("de", "het", "een", "van", "dat", "op", "te", "zijn", "voor", "niet", "maar", "ook"),
    "sv" -> Set("och", "att", "det", "som", "på", "är", "av", "den", "till", "inte", "har", "om"))

  /** N-gram/stopword-heuristic language ID; "und" (undetermined) when no
    * language scores. Pure function → deterministic narrow map. */
  def langIdOf(text: String): String = {
    if (text == null) return "und" // Spark hands UDFs the raw null
    val toks = text.toLowerCase.split("[^\\p{L}]+").filter(_.nonEmpty)
    if (toks.isEmpty) return "und"
    val scores = stopwords.map { case (lang, sw) => lang -> toks.count(sw.contains) }
    val (best, score) = scores.maxBy { case (l, s) => (s, l) }
    if (score == 0) "und" else best
  }

  def withLangId(df: DataFrame, textCol: String, out: String = "lang_id"): DataFrame = {
    val f = udf(langIdOf _)
    df.withColumn(out, f(col(textCol)))
  }

  // ------------------------------------------------------------ fingerprint
  /** Karp–Rabin rolling hash over whitespace tokens: position-sensitive
    * 64-bit document fingerprint (same token multiset in different order →
    * different print, unlike a bag-of-words hash). */
  def rollingFingerprint(text: String): Long = {
    if (text == null) return 0L // null text -> empty-document fingerprint
    val B = 1000000007L
    var h = 0L
    for (tok <- text.trim.split("\\s+") if tok.nonEmpty)
      h = h * B + (MurmurHash3.stringHash(tok).toLong & 0xFFFFFFFFL)
    h
  }

  def withFingerprint(df: DataFrame, textCol: String, out: String = "fingerprint"): DataFrame = {
    val f = udf(rollingFingerprint _)
    df.withColumn(out, f(col(textCol)))
  }

  /** Whitespace-normalized content hash (SQL-expressible fingerprint used
    * by the oracle-checked queries; rollingFingerprint is the stronger,
    * order-sensitive variant). */
  def normalizedHash(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))
}
