package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for corpus curation: language id, quality
  * scoring, token counting. All per-row codegen'd expressions — zero
  * shuffles, zero UDFs; aggregation is whatever the caller groups by.
  */
object TextAnalysis {

  def words(text: Column): Column = split(text, " ")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(words(text))

  /** BPE-ish token count: alpha runs, digit runs, and single
    * non-alphanumeric marks each count as one token — a cheap stand-in
    * for subword tokenizers when budgeting training data. */
  val BpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def tokenCountRegex(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenPattern), lit(0)))

  /** Tiny per-language function-word lists for the n-gram-free stopword
    * heuristic. Real deployments swap in full lists; the mechanics —
    * per-row set membership counting, argmax across languages — don't
    * change. */
  val StopwordSets: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu"),
    "es" -> Seq("el", "la", "de", "que", "y", "un", "es"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "que"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我"))

  /** Fraction of tokens that appear in `stopwords`. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val sw = array(stopwords.map(lit): _*)
    size(filter(words(text), w => array_contains(sw, w))).cast("double") /
      greatest(tokenCount(text), lit(1))
  }

  /** Language id by stopword-hit argmax; ties and zero-hit texts fall
    * back to "und" (undetermined). */
  def langId(text: Column): Column = {
    val scored = StopwordSets.map { case (lang, sw) =>
      struct(stopwordRatio(text, sw).as("score"), lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Composite quality score in [0,1]: length band + punctuation ratio +
    * mean word length band — the standard cheap filters applied before
    * expensive model-based scoring. */
  def qualityScore(text: Column, nChars: Column): Column = {
    val nTokens = tokenCount(text)
    val punct = size(filter(
      transform(words(text), w => substring(w, 1, 1)),
      c => !c.rlike("[A-Za-z0-9]"))).cast("double") /
      greatest(nTokens, lit(1))
    val meanWordLen = nChars.cast("double") / greatest(nTokens, lit(1))
    val lenBand = when(nChars.between(100, 400), 1.0d)
      .when(nChars.between(50, 99) || nChars.between(401, 600), 0.5d)
      .otherwise(0.0d)
    val wordBand = when(meanWordLen.between(3.0, 8.0), 1.0d).otherwise(0.5d)
    round((lenBand + wordBand + (lit(1.0d) - least(punct * 4, lit(1.0d)))) / 3.0d, 4)
  }
}
