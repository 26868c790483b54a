package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextExpressions

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, fingerprinting. All pure Catalyst
  * column expressions (codegen'd, no UDFs) except the fingerprint, which
  * is a custom Expression. Everything here is a projection — zero
  * shuffles, scales linearly with input splits.
  */
object TextAnalysis {

  /** Tiny per-language stopword profiles for the n-gram/stopword
    * heuristic language scorer. Deliberately small: language ID at
    * pipeline scale wants a cheap first pass; ambiguous docs can be
    * re-scored by a heavier model downstream. */
  val StopwordProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "se", "del", "las"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "den", "mit", "für", "auf"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "est", "dans", "que", "une"),
    "zh" -> Seq("的", "了", "是", "在", "我", "有", "他", "这", "中", "大"))

  def words(text: Column): Column = Dedup.words(text)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(words(text))

  /** BPE-ish token count: letter runs, digit runs, and single
    * non-alphanumeric marks each count as one token (the pre-merge
    * word-splitting regime of byte-pair tokenizers). */
  def bpeishTokenCount(text: Column): Column =
    size(filter(
      split(text, "(?<=[^A-Za-z0-9])|(?=[^A-Za-z0-9])"),
      t => t.rlike("^\\S")))

  /** Language scores: struct of per-language stopword-hit counts over the
    * first `cap` words; langId = argmax (ties → profile order). */
  def langId(text: Column): Column = {
    val ws = words(text)
    // score = hits of language stopwords among distinct words (cheap set
    // intersect; zh profile matches substrings since zh has no spaces)
    val scored = StopwordProfiles.toSeq.sortBy(_._1).map { case (lang, stops) =>
      val score =
        if (lang == "zh")
          stops.map(s => when(text.contains(s), 1).otherwise(0)).reduce(_ + _)
        else
          size(array_intersect(array_distinct(ws), typedLit(stops)))
      struct(score.cast("int").as("score"), lit(lang).as("lang"))
    }
    // max over (score, lang); require ≥1 hit else "und"
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Quality features + a composite score ∈ [0,1]:
    * length, word count, mean word length, punctuation ratio, stopword
    * ratio, uppercase ratio, digit ratio — the standard cheap filters
    * (Gopher/C4-style) as one codegen'd struct. */
  def qualityFeatures(text: Column): Column = {
    val nChars = length(text).cast("double")
    val ws = words(text)
    val nWords = size(ws).cast("double")
    val meanWordLen = when(nWords > 0,
      aggregate(transform(ws, w => length(w).cast("double")), lit(0.0), _ + _) / nWords)
      .otherwise(lit(0.0))
    val punct = (nChars - length(regexp_replace(text, "[\\p{Punct}]", ""))) /
      greatest(nChars, lit(1.0))
    val upper = (nChars - length(regexp_replace(text, "[A-Z]", ""))) /
      greatest(nChars, lit(1.0))
    val digits = (nChars - length(regexp_replace(text, "[0-9]", ""))) /
      greatest(nChars, lit(1.0))
    val stops = typedLit(StopwordProfiles("en"))
    val stopRatio = when(nWords > 0,
      size(filter(ws, w => w.isin(StopwordProfiles("en"): _*))).cast("double") / nWords)
      .otherwise(lit(0.0))
    struct(
      nChars.as("n_chars"), nWords.as("n_words"),
      round(meanWordLen, 4).as("mean_word_len"),
      round(punct, 4).as("punct_ratio"),
      round(upper, 4).as("upper_ratio"),
      round(digits, 4).as("digit_ratio"),
      round(stopRatio, 4).as("stopword_ratio"))
  }

  /** Composite quality score: word-count band × word-length band ×
    * punctuation cap × stopword floor (each factor ∈ [0,1]). */
  def qualityScore(text: Column): Column = {
    val f = qualityFeatures(text)
    val wc = f.getField("n_words")
    val wordBand = when(wc >= 50 && wc <= 100000, 1.0)
      .when(wc > 0, least(wc / 50.0, lit(1.0))).otherwise(0.0)
    val mwl = f.getField("mean_word_len")
    val lenBand = when(mwl.between(3.0, 10.0), 1.0).otherwise(0.5)
    val punctCap = when(f.getField("punct_ratio") <= 0.2, 1.0).otherwise(0.5)
    val stopFloor = when(f.getField("stopword_ratio") >= 0.05, 1.0).otherwise(0.7)
    round(wordBand * lenBand * punctCap * stopFloor, 4)
  }

  /** Full per-document analysis projection over a documents table. */
  def analyze(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    TextExpressions.register(df.sparkSession)
    val t = col(textCol)
    df.select(
      col(idCol),
      tokenCount(t).as("n_words"),
      bpeishTokenCount(t).as("n_bpeish_tokens"),
      langId(t).as("lang_pred"),
      qualityFeatures(t).as("quality"),
      qualityScore(t).as("quality_score"),
      TextExpressions.fingerprint(t, 32).as("fingerprint"))
  }
}
