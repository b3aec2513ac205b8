package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, document fingerprinting.
  *
  * All pure column arithmetic (codegen'd, pushdown-friendly) — each is a
  * map-only operator with zero shuffles, so it streams at scan speed over
  * 100 TB.
  */
object TextAnalysis {

  /** Tiny per-language function-word lists for the n-gram/stopword
    * language-ID heuristic (public-knowledge function words). */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "es" -> Seq("el", "la", "los", "las", "es", "una", "por", "con", "para", "del"),
    "fr" -> Seq("le", "la", "les", "des", "est", "une", "dans", "pour", "que", "avec"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不", "这", "他"))

  /** Per-language marker hit count over the token array. */
  def markerHits(toks: Column, langTokens: Seq[String]): Column = {
    val markers = array(langTokens.map(lit): _*)
    size(filter(toks, t => array_contains(markers, t)))
  }

  /** Language-ID: argmax over marker-hit ratios; "und" (undetermined)
    * when no marker fires. Output columns: predicted_lang, lang_score. */
  def langId(text: Column): (Column, Column) = {
    val toks = TextFunctions.tokensCol(text, removeStopwords = false)
    val n = greatest(size(toks), lit(1)).cast("double")
    val scored = LangMarkers.toSeq.sortBy(_._1).map { case (lang, ms) =>
      struct((markerHits(toks, ms).cast("double") / n).as("score"),
        lit(lang).as("lang"))
    }
    // array_max on struct(score, lang): max by score, ties → greatest
    // lang string (deterministic)
    val best = array_max(array(scored: _*))
    val lang = when(best.getField("score") > 0.0, best.getField("lang"))
      .otherwise(lit("und"))
    (lang, best.getField("score"))
  }

  /** Heuristic quality signals + composite score ∈ [0,1]:
    *  - n_chars, n_tokens, mean token length
    *  - alpha_ratio: fraction of chars that are letters
    *  - punct_ratio: fraction of chars that are .,;:!?
    *  - stopword_ratio: fraction of tokens in the English stopword list
    * score = 0.4·clamp(n_tokens/100) + 0.3·alpha + 0.3·(1 − punct·5 clamped)
    */
  def qualitySignals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // materialize the token array once; inlining the tokenizer into
    // every consumer would re-run the regex per reference
    val staged = df.select(col(idCol), col(textCol),
      TextFunctions.tokensCol(col(textCol), removeStopwords = false)
        .as("_toks"))
    qualityFromTokens(staged, idCol, textCol)
  }

  private def qualityFromTokens(df: DataFrame, idCol: String,
                                textCol: String): DataFrame = {
    val text = col(textCol)
    val toksAll = col("_toks")
    val nChars = length(text).cast("double")
    val safeChars = greatest(nChars, lit(1.0))
    val nTokens = size(toksAll).cast("double")
    val sw = array(TextFunctions.EnglishStopwordsSorted.map(lit): _*)
    val nStop = size(filter(toksAll, t => array_contains(sw, t))).cast("double")
    val alpha = (nChars - length(regexp_replace(text, "[A-Za-z]", "")))
      .cast("double") / safeChars
    val punct = (nChars - length(regexp_replace(text, "[.,;:!?]", "")))
      .cast("double") / safeChars
    val meanTokLen = when(nTokens > 0,
      aggregate(toksAll, lit(0L), (acc, t) => acc + length(t)).cast("double") / nTokens)
      .otherwise(lit(0.0))
    val score =
      lit(0.4) * least(nTokens / 100.0, lit(1.0)) +
        lit(0.3) * alpha +
        lit(0.3) * (lit(1.0) - least(punct * 5.0, lit(1.0)))
    df.select(col(idCol).as("id"),
      nChars.cast("long").as("n_chars"),
      nTokens.cast("long").as("n_tokens"),
      round(meanTokLen, 6).as("mean_token_len"),
      round(alpha, 6).as("alpha_ratio"),
      round(punct, 6).as("punct_ratio"),
      round(when(nTokens > 0, nStop / nTokens).otherwise(0.0), 6)
        .as("stopword_ratio"),
      round(score, 6).as("quality_score"))
  }

  /** Whitespace token count + BPE-ish subword count (`~chars/4` lower
    * bound vs regex pieces — the public GPT-2-style pretokenizer regex,
    * simplified to ASCII classes). */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val text = col(textCol)
    val ws = TextFunctions.tokenCountCol(text)
    val bpePieces = size(regexp_extract_all(text,
      lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]+|\\s+"), lit(0)))
    df.select(col(idCol).as("id"),
      ws.as("ws_tokens"),
      bpePieces.as("bpe_pieces"),
      ceil(length(text).cast("double") / 4.0).cast("long").as("char_estimate"))
  }

  /** Document fingerprint: SHA-256 over whitespace-normalized lowercase
    * text — stable under formatting noise; first 16 hex chars kept as a
    * compact join key. */
  def fingerprint(text: Column): Column =
    substring(sha2(
      trim(regexp_replace(lower(text), "\\s+", " ")).cast("binary"), 256), 1, 16)
}
