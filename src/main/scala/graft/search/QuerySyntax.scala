package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Bm25, Phrase}

/** Search-box query SYNTAX compiled to the engine's retrieval
  * operators — the user-facing grammar every search product ships
  * (Lucene classic query parser semantics, reduced to the legs this
  * engine implements):
  *
  *   - `"quoted words"` → an EXACT PHRASE gate ([[Phrase.phraseSearch]]
  *     positional intersection)
  *   - `+term`          → MUST gate (postings conjunction)
  *   - `-term`          → MUST_NOT gate (postings anti-join)
  *   - bare terms       → the BM25 scoring query
  *
  * All gates apply BEFORE the cut (filter-then-rank — the
  * [[Bm25.searchBooleanTree]] semantics), with BM25 statistics over
  * the eligible corpus. The parse is a deterministic pure function of
  * the query string; execution composes existing operators, so the
  * scale posture is theirs (broadcast phrase words + one bounded
  * shuffle per phrase, postings gates, one scoring pass).
  */
object QuerySyntax {

  /** The parsed tree: exact phrases (tokenized), must terms, must_not
    * terms, and the bare scoring terms. */
  final case class Parsed(phrases: Seq[Seq[String]], must: Seq[String],
                          mustNot: Seq[String], terms: Seq[String])

  private val QuotedRe = "\"([^\"]*)\"".r

  /** Parse `"exact phrase" +must -not bare` syntax. Prefixed and
    * quoted segments tokenize through the engine tokenizer (keep-stop,
    * matching the gates' postings); a bare `+` or `-` with no word is
    * ignored. */
  def parse(q: String): Parsed = {
    require(q != null && q.trim.nonEmpty, "empty query")
    val phrases = QuotedRe.findAllMatchIn(q).map(_.group(1)).toSeq
      .map(p => TextFunctions.tokenize(p, removeStopwords = false))
      .filter(_.nonEmpty)
    val rest = QuotedRe.replaceAllIn(q, " ")
    val raw = rest.split("\\s+").filter(_.nonEmpty).toSeq
    def toks(s: String): Seq[String] =
      TextFunctions.tokenize(s, removeStopwords = false)
    val must = raw.filter(t => t.startsWith("+") && t.length > 1)
      .flatMap(t => toks(t.substring(1)))
    val mustNot = raw.filter(t => t.startsWith("-") && t.length > 1)
      .flatMap(t => toks(t.substring(1)))
    val bare = raw.filterNot(t => t.startsWith("+") || t.startsWith("-"))
      .flatMap(toks)
    Parsed(phrases, must.distinct, mustNot.distinct, bare.distinct)
  }

  /** Compile + execute over a corpus: phrase gates first (each a
    * left-semi join against the positional intersection), then the
    * must/must_not/scoring tree. The query must carry at least one
    * bare scoring term (a pure-filter query has no ranking signal). */
  def search(docs: DataFrame, idCol: String, textCol: String,
             query: String, k: Int): DataFrame = {
    val p = parse(query)
    require(p.terms.nonEmpty,
      s"query '$query' has no bare scoring terms")
    val gated = p.phrases.foldLeft(docs) { (d, ph) =>
      d.join(Phrase.phraseSearch(d, idCol, textCol, ph)
          .select(col("doc_id").as(idCol)),
        Seq(idCol), "left_semi")
    }
    Bm25.searchBooleanTree(gated, idCol, textCol,
      p.terms.mkString(" "), must = p.must, should = Nil,
      mustNot = p.mustNot, shouldBoost = 0.0, k = k)
  }
}
