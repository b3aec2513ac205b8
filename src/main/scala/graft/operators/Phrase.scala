package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Exact phrase search over a positional index — the IR operator BM25's
  * bag-of-words scoring cannot express (ref surface: the reference
  * serves substring/keyword matching through its sparse/BM25 legs;
  * positional adjacency is the standard inverted-index extension,
  * Manning IR ch. 2).
  *
  * Method: the classic positional-intersection trick — a token at
  * position p matching phrase word i votes for candidate start p − i;
  * a start with votes from ALL |phrase| word slots is an exact match
  * (distinct positions imply distinct slots, so `count == |phrase|`
  * is exact even with repeated words in the phrase).
  *
  * Scale posture: the posting stream is pruned MAP-SIDE by the
  * broadcast phrase-word relation before anything shuffles — the
  * (id, start) groupBy carries only phrase-word postings (corpus
  * frequency of the phrase's words), never the corpus token stream.
  * At 100 TB this is a broadcast semi-join + one bounded shuffle,
  * the same shape as [[Sketch.heavyHitters]]' verify pass.
  */
object Phrase {

  /** @param standingPostings an optional STANDING positional-postings
    *        relation `(doc_id, pos, tok)` (tokenized with the same
    *        `removeStopwords` setting) — the positional half of a
    *        persisted index, so the serve path skips the corpus
    *        re-tokenize. Matching is per-doc-local, so a full-corpus
    *        relation is sound even for a pre-gated `docs` input as
    *        long as the caller intersects the result with its ids.
    * @return one row per matching document:
    *         (doc_id, n_matches, first_pos), 0-based token positions. */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrase: Seq[String],
                   removeStopwords: Boolean = false,
                   standingPostings: Option[DataFrame] = None): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val spark = docs.sparkSession
    import spark.implicits._
    val words = broadcast(
      phrase.zipWithIndex.toDF("w", "i"))
    val postings = standingPostings.getOrElse(
      docs.select(col(idCol).as("doc_id"),
        posexplode(TextFunctions.tokensCol(col(textCol),
          removeStopwords = removeStopwords)).as(Seq("pos", "tok"))))
    postings.join(words, col("tok") === col("w"))
      .select(col("doc_id"), (col("pos") - col("i")).as("start"))
      .groupBy("doc_id", "start").agg(count(lit(1)).as("n"))
      .filter(col("n") === phrase.length && col("start") >= 0)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_matches"),
        min("start").cast("long").as("first_pos"))
  }

  /** ALL phrase + proximity gates of one query evaluated in ONE pass
    * over a positional-postings relation `(doc_id, pos, tok)` — the
    * stage-fusion form of chaining [[phraseSearch]] /
    * [[proximitySearch]] semi-joins (r12: each chained gate paid its
    * own shuffle + scheduling floor; fused, the word-filtered
    * postings shuffle ONCE on doc_id and every verdict is an in-row
    * bounded array predicate). Semantics are exactly the chained
    * gates':
    *
    *  - exact phrase `ws`: ∃ start ∈ pos(ws₀) with ws_i at start+i
    *    ∀i — provably the (doc, start)-vote count == |ws| rule of
    *    [[phraseSearch]] (for fixed start, slot i can only be voted
    *    by the token at start+i)
    *  - slop phrase `(ws, k)`: every consecutive pair (w1, w2) has
    *    some p2 ∈ pos(w2) with p1 + 1 ≤ p2 ≤ p1 + k for some
    *    p1 ∈ pos(w1) — [[proximitySearch]]'s ordered within-k
    *    interval, AND-chained like the caller's sequential semi-joins
    *    (per-doc-local verdicts, so chained restriction ≡ conjunction)
    *
    * Per-doc position lists are word-frequency-bounded; the exists/
    * array_contains predicates are codegen'd collection ops. Output:
    * one `doc_id` row per doc passing ALL gates.
    *
    * `must`/`mustNot` (r13) fold the BOOLEAN membership gates into the
    * SAME pass — a must word's verdict is a non-empty position list, a
    * must_not word's an empty one — so a query like
    * `"big data"~3 +table -error` pays ONE doc_id shuffle for its
    * whole gate tree instead of one per gate family. Soundness
    * requires at least one POSITIVE gate (phrase, slop, or must):
    * docs containing none of the gate words are absent from the
    * aggregated relation, which is correct exactly when absence
    * implies failing a positive gate. A pure must_not query must use
    * the anti-join form instead. */
  def gateIds(postings: DataFrame, phrases: Seq[Seq[String]],
              slops: Seq[(Seq[String], Int)],
              must: Seq[String] = Nil,
              mustNot: Seq[String] = Nil): DataFrame = {
    require(phrases.nonEmpty || slops.nonEmpty || must.nonEmpty,
      "no positive gates — absent docs would be wrongly excluded")
    val words = (phrases.flatten ++ slops.flatMap(_._1) ++ must ++
      mustNot).distinct
    def pcol(w: String) = col(s"__p${words.indexOf(w)}")
    val wordCols = words.zipWithIndex.map { case (w, i) =>
      sort_array(collect_list(when(col("tok") === w, col("pos"))))
        .as(s"__p$i")
    }
    val perDoc = postings.filter(col("tok").isin(words: _*))
      .groupBy(col("doc_id"))
      .agg(wordCols.head, wordCols.tail: _*)
    val phraseOk = phrases.map { ph =>
      exists(pcol(ph.head), s =>
        ph.zipWithIndex.tail.map { case (w, i) =>
          array_contains(pcol(w), s + i)
        }.foldLeft(lit(true))(_ && _))
    }
    val slopOk = slops.flatMap { case (ws, slop) =>
      ws.sliding(2).collect { case Seq(w1, w2) =>
        exists(pcol(w1), a =>
          exists(pcol(w2), b => b >= a + 1 && b <= a + slop))
      }
    }
    val mustOk = must.distinct.map(w => size(pcol(w)) > 0)
    val mustNotOk = mustNot.distinct.map(w => size(pcol(w)) === 0)
    perDoc.filter((phraseOk ++ slopOk ++ mustOk ++ mustNotOk)
        .reduce(_ && _))
      .select(col("doc_id"))
  }

  /** Proximity ("sloppy phrase") search: documents where `w2` occurs
    * within `slop` tokens AFTER `w1` (ordered, gap in [1, slop]) —
    * Manning IR's positional within-k query. Rather than the naive
    * per-doc position pair join (quadratic on a doc that repeats a hot
    * word), the position pairing IS a point-in-interval problem and
    * reuses [[RangeJoin.pointInInterval]]: each w1 position opens the
    * interval [p+1, p+slop+1) on the doc's token axis, w2 positions
    * are the points, and the bucketed timeline bounds candidates by
    * density per slop-window, not word frequency.
    *
    * Output: (doc_id, n_pairs, min_gap) per matching doc. */
  def proximitySearch(docs: DataFrame, idCol: String, textCol: String,
                      w1: String, w2: String, slop: Int,
                      removeStopwords: Boolean = false,
                      standingPostings: Option[DataFrame] = None): DataFrame = {
    require(slop >= 1, s"bad slop: $slop")
    val postings = standingPostings.getOrElse(
      docs.select(col(idCol).as("doc_id"),
        posexplode(TextFunctions.tokensCol(col(textCol),
          removeStopwords = removeStopwords)).as(Seq("pos", "tok"))))
    val lefts = postings.filter(col("tok") === w1)
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("w_start"),
        (col("pos") + slop + 1).cast("long").as("w_end"),
        col("pos").cast("long").as("p1"))
    val rights = postings.filter(col("tok") === w2)
      .select(col("doc_id"), col("pos").cast("long").as("p2"))
    RangeJoin.pointInInterval(rights, lefts, Seq("doc_id"),
        "p2", "w_start", "w_end", bucketWidth = slop + 1L)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_pairs"),
        min(col("p2") - col("p1")).as("min_gap"))
  }
}
