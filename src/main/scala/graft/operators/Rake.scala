package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions.col

/** RAKE keyword extraction (operator A4).
  *
  * Semantics mirror packages/shared/plugins/builtins/keyword_extractor.py:196-307:
  *  - sentences split on `[.!?\n]+`
  *  - words `\b[a-zA-Z][a-zA-Z0-9]*(?:'[a-zA-Z]+)?\b`, lowercased
  *  - candidate phrases = maximal stopword-free word runs per sentence
  *  - filtered to <= maxWords words and joined length >= minChars
  *  - word score = (degree + freq) / freq, degree summing (len-1) over
  *    the word's phrases; phrase score = Σ word scores
  *  - top-k phrases by score
  *
  * Deviation (documented): the reference breaks score ties by dict
  * insertion order (first occurrence); we break by phrase string
  * ascending so results are order-independent — the only semantics
  * that's deterministic under distributed execution.
  *
  * RAKE is doc-local, so the operator is a flatMap over the scan: zero
  * shuffles at any corpus size.
  */
object Rake {

  /** RAKE stopword list (keyword_extractor.py:16-190, 174 words). */
  val StopWords: Set[String] = Set(
    "a", "about", "above", "after", "again", "against", "all", "am", "an",
    "and", "any", "are", "aren't", "as", "at", "be", "because", "been",
    "before", "being", "below", "between", "both", "but", "by", "can't",
    "cannot", "could", "couldn't", "did", "didn't", "do", "does",
    "doesn't", "doing", "don't", "down", "during", "each", "few", "for",
    "from", "further", "had", "hadn't", "has", "hasn't", "have",
    "haven't", "having", "he", "he'd", "he'll", "he's", "her", "here",
    "here's", "hers", "herself", "him", "himself", "his", "how", "how's",
    "i", "i'd", "i'll", "i'm", "i've", "if", "in", "into", "is", "isn't",
    "it", "it's", "its", "itself", "let's", "me", "more", "most",
    "mustn't", "my", "myself", "no", "nor", "not", "of", "off", "on",
    "once", "only", "or", "other", "ought", "our", "ours", "ourselves",
    "out", "over", "own", "same", "shan't", "she", "she'd", "she'll",
    "she's", "should", "shouldn't", "so", "some", "such", "than", "that",
    "that's", "the", "their", "theirs", "them", "themselves", "then",
    "there", "there's", "these", "they", "they'd", "they'll", "they're",
    "they've", "this", "those", "through", "to", "too", "under", "until",
    "up", "very", "was", "wasn't", "we", "we'd", "we'll", "we're",
    "we've", "were", "weren't", "what", "what's", "when", "when's",
    "where", "where's", "which", "while", "who", "who's", "whom", "why",
    "why's", "with", "won't", "would", "wouldn't", "you", "you'd",
    "you'll", "you're", "you've", "your", "yours", "yourself",
    "yourselves")

  private val WordRe = "\\b[a-zA-Z][a-zA-Z0-9]*(?:'[a-zA-Z]+)?\\b".r
  private val SentenceRe = "[.!?\\n]+"

  /** Candidate phrases (word lists) for a text. */
  def candidatePhrases(text: String, maxWords: Int = 4,
                       minChars: Int = 3): Seq[Seq[String]] = {
    if (text == null || text.trim.isEmpty) return Seq.empty
    val phrases = Seq.newBuilder[Seq[String]]
    for (sentence <- text.split(SentenceRe)) {
      val words = WordRe.findAllIn(sentence.toLowerCase(java.util.Locale.ROOT)).toSeq
      var cur = Seq.newBuilder[String]
      var nonEmpty = false
      for (w <- words) {
        if (StopWords(w)) {
          if (nonEmpty) { phrases += cur.result(); cur = Seq.newBuilder; nonEmpty = false }
        } else { cur += w; nonEmpty = true }
      }
      if (nonEmpty) phrases += cur.result()
    }
    phrases.result().filter(p =>
      p.size <= maxWords && p.mkString(" ").length >= minChars)
  }

  /** Fixed-point scale for word scores: 6 decimal digits. */
  val ScoreScale: Long = 1000000L

  /** (phrase, score) pairs, score-desc / phrase-asc, top-k.
    *
    * Scoring is FIXED-POINT: each word score (degree+freq)/freq is
    * quantized half-up to 1e-6 using pure integer arithmetic, and the
    * phrase score is the exact integer sum of quantized word scores.
    * Rationale: ranking on raw float sums proved engine-dependent twice
    * (round-1: summation order; round-2: residual divergence even with
    * canonical ascending-order sums) — near-tied phrases flip ranks on
    * last-ULP differences. Integer arithmetic is bit-identical in every
    * engine, the ranking key is exact, and the final Double (scaled /
    * 1e6, both operands exact, one correctly-rounded IEEE division) is
    * reproducible bit-for-bit. Max quantization error per phrase is
    * 4 * 5e-7 — far below the reference's own float noise.
    */
  def extract(text: String, topK: Int = 10, minChars: Int = 3,
              maxWords: Int = 4): Seq[(String, Double)] =
    extractScaled(text, topK, minChars, maxWords).map { case (p, s) =>
      p -> s.toDouble / ScoreScale
    }

  /** (phrase, quantized score) with score = round(wscore * 1e6) summed. */
  def extractScaled(text: String, topK: Int = 10, minChars: Int = 3,
                    maxWords: Int = 4): Seq[(String, Long)] = {
    val phrases = candidatePhrases(text, maxWords, minChars)
    if (phrases.isEmpty) return Seq.empty
    val freq = collection.mutable.Map.empty[String, Long]
    val degree = collection.mutable.Map.empty[String, Long]
    for (p <- phrases; w <- p) {
      freq(w) = freq.getOrElse(w, 0L) + 1
      degree(w) = degree.getOrElse(w, 0L) + (p.size - 1)
    }
    // half-up((deg+freq)*1e6 / freq) = floor(((deg+freq)*2e6 + freq) / (2*freq))
    val wordScore = freq.keys.map { w =>
      val a = degree(w) + freq(w)
      w -> ((a * 2 * ScoreScale + freq(w)) / (2 * freq(w)))
    }.toMap
    val phraseScores = phrases.map(p => p.mkString(" ") ->
      p.map(wordScore.getOrElse(_, 0L)).sum).toMap
    phraseScores.toSeq
      .sortBy { case (p, s) => (-s, p) }
      .take(topK)
  }

  case class RakeRow(doc_id: String, phrase: String, score: Double, rank: Int)

  /** Top-k keywords per document: (doc_id, phrase, score, rank). */
  def extractKeywords(df: DataFrame, idCol: String, textCol: String,
                      topK: Int = 10): DataFrame = {
    val ds = df.select(col(idCol).cast("string").as("id"),
        col(textCol).as("text"))
      .as(Encoders.product[Chunking.DocIn])
    ds.flatMap { d =>
      extract(d.text, topK).zipWithIndex.map { case ((p, s), i) =>
        RakeRow(d.id, p, s, i + 1)
      }
    }(Encoders.product[RakeRow]).toDF()
  }
}
