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
  *   - `"quoted words"`   → an EXACT PHRASE gate
  *     ([[Phrase.phraseSearch]] positional intersection)
  *   - `"quoted words"~k` → a PROXIMITY ("sloppy phrase") gate:
  *     consecutive word pairs each within k tokens, ordered
  *     ([[Phrase.proximitySearch]] chained per pair — the ordered
  *     within-k chain, a documented simplification of Lucene's
  *     minimal-edit sloppy match; identical for 2-word phrases)
  *   - `+term`            → MUST gate (postings conjunction)
  *   - `-term`            → MUST_NOT gate (postings anti-join)
  *   - `term^b`           → BOOSTED scoring term (b multiplies the
  *     term's query weight — the Lucene boost semantic)
  *   - `field:value`      → FIELD FILTER: equality on a keyword
  *     column the caller maps via `fieldCols` (Lucene's field-scoped
  *     term query, restricted to the keyword-equality case; unknown
  *     fields fail loudly; negated fields are not supported)
  *   - bare terms         → the BM25 scoring query
  *
  * All gates apply BEFORE the cut (filter-then-rank — the
  * [[Bm25.searchBooleanTree]] semantics), with BM25 statistics over
  * the eligible corpus. The parse is a deterministic pure function of
  * the query string; execution composes existing operators, so the
  * scale posture is theirs (broadcast phrase words + one bounded
  * shuffle per phrase/pair gate, postings gates, one scoring pass).
  */
object QuerySyntax {

  /** The parsed tree: exact phrases (tokenized), sloppy phrases
    * (tokenized, with their slop), must terms, must_not terms, the
    * bare scoring terms, and per-term boosts (`term^b`; unboosted
    * terms are absent from the map). */
  final case class Parsed(phrases: Seq[Seq[String]],
                          slops: Seq[(Seq[String], Int)],
                          must: Seq[String], mustNot: Seq[String],
                          terms: Seq[String],
                          boosts: Map[String, Double],
                          fields: Seq[(String, String)])

  private val QuotedSlopRe = "\"([^\"]*)\"~(\\d+)".r
  private val QuotedRe = "\"([^\"]*)\"".r
  private val BoostRe = "^(.+)\\^(\\d+(?:\\.\\d+)?)$".r
  private val FieldRe = "^([A-Za-z_][A-Za-z0-9_]*):(.+)$".r

  /** Parse `"exact phrase" "near phrase"~k +must -not bare boosted^2`
    * syntax. Prefixed and quoted segments tokenize through the engine
    * tokenizer (keep-stop, matching the gates' postings); a bare `+`
    * or `-` with no word is ignored; a slop phrase needs >= 2 tokens
    * (fewer: it degrades to an exact-phrase gate, which a 0/1-token
    * phrase trivially is). */
  def parse(q: String): Parsed = {
    require(q != null && q.trim.nonEmpty, "empty query")
    def toks(s: String): Seq[String] =
      TextFunctions.tokenize(s, removeStopwords = false)
    val slops = QuotedSlopRe.findAllMatchIn(q)
      .map(m => (toks(m.group(1)), m.group(2).toInt)).toSeq
      .filter { case (ts, k) => ts.size >= 2 && k >= 1 }
    val noSlop = QuotedSlopRe.replaceAllIn(q, " ")
    val phrases = QuotedRe.findAllMatchIn(noSlop).map(_.group(1)).toSeq
      .map(p => toks(p))
      .filter(_.nonEmpty)
    val rest = QuotedRe.replaceAllIn(noSlop, " ")
    val raw = rest.split("\\s+").filter(_.nonEmpty).toSeq
    val must = raw.filter(t => t.startsWith("+") && t.length > 1)
      .flatMap(t => toks(t.substring(1)))
    val mustNot = raw.filter(t => t.startsWith("-") && t.length > 1)
      .flatMap(t => toks(t.substring(1)))
    val (fieldRaw, bareRaw) = raw
      .filterNot(t => t.startsWith("+") || t.startsWith("-"))
      .partition(t => FieldRe.findFirstIn(t).isDefined)
    val fields = fieldRaw.collect { case FieldRe(f, v) => (f, v) }
    val boosts = bareRaw.collect { case BoostRe(w, b) =>
      toks(w).map(t => t -> b.toDouble)
    }.flatten.toMap
    val bare = bareRaw.flatMap {
      case BoostRe(w, _) => toks(w)
      case t => toks(t)
    }
    Parsed(phrases, slops, must.distinct, mustNot.distinct,
      bare.distinct, boosts, fields.distinct)
  }

  /** Compile + execute over a corpus: phrase and proximity gates first
    * (each a left-semi join against its positional intersection /
    * within-k pair chain), then the must/must_not/scoring tree with
    * per-term boosts threaded into the query vector. The query must
    * carry at least one bare scoring term (a pure-filter query has no
    * ranking signal). */
  def search(docs: DataFrame, idCol: String, textCol: String,
             query: String, k: Int,
             fieldCols: Map[String, String] = Map.empty,
             standing: Option[Standing] = None): DataFrame = {
    val p = parse(query)
    require(p.terms.nonEmpty,
      s"query '$query' has no bare scoring terms")
    // field filters first: plain column equality pushes into the scan,
    // shrinking every downstream gate and the BM25 corpus itself
    // (filtered-collection stats, like every other gate here)
    val fieldGated = p.fields.foldLeft(docs) { case (d, (f, v)) =>
      require(fieldCols.contains(f),
        s"unknown field '$f' in query '$query' " +
          s"(known: ${fieldCols.keys.toSeq.sorted.mkString(", ")})")
      d.filter(col(fieldCols(f)) === v)
    }
    // standing serve path: ALL gates — phrase, proximity, AND the
    // boolean +must/-must_not memberships (r13) — fuse into ONE pass
    // over the standing positional postings (Phrase.gateIds —
    // per-doc-local verdicts, so the single conjunctive pass equals
    // the chained semi/anti-joins; the positional relation is the
    // same keep-stopword tokenize as the membership relation, so the
    // membership verdicts are identical). The boolean tree then
    // receives an already-fully-gated corpus (must/mustNot = Nil) and
    // derives eligible statistics from the standing postings — the
    // whole query pays one gate shuffle, one stats derivation, one
    // scoring pass.
    // NOTE (r12, measured): do NOT eagerly pin the gated id set —
    // ReuseExchange already dedupes the gate subtree across the
    // boolean tree's consumers, and an eager localCheckpoint costs a
    // full extra materialization job per invocation (A/B'd:
    // 0.94 → 1.84 s on search_query_syntax).
    val fusedBoolGates = standing.isDefined &&
      (p.phrases.nonEmpty || p.slops.nonEmpty)
    val gated = standing match {
      case Some(st) if fusedBoolGates =>
        fieldGated.join(
          Phrase.gateIds(st.posToks, p.phrases, p.slops,
              must = p.must, mustNot = p.mustNot)
            .select(col("doc_id").as(idCol)),
          Seq(idCol), "left_semi")
      case _ =>
        val phraseGated = p.phrases.foldLeft(fieldGated) { (d, ph) =>
          d.join(Phrase.phraseSearch(d, idCol, textCol, ph)
              .select(col("doc_id").as(idCol)),
            Seq(idCol), "left_semi")
        }
        p.slops.foldLeft(phraseGated) { case (d, (ws, slop)) =>
          ws.sliding(2).foldLeft(d) { case (dd, Seq(w1, w2)) =>
            dd.join(
              Phrase.proximitySearch(dd, idCol, textCol, w1, w2, slop)
                .select(col("doc_id").as(idCol)),
              Seq(idCol), "left_semi")
          }
        }
    }
    Bm25.searchBooleanTree(gated, idCol, textCol,
      p.terms.mkString(" "),
      must = if (fusedBoolGates) Nil else p.must, should = Nil,
      mustNot = if (fusedBoolGates) Nil else p.mustNot,
      shouldBoost = 0.0, k = k,
      termBoosts = p.boosts, standing = standing.map(_.bm25))
  }

  /** The standing relations the serve path keeps beside the corpus
    * (built once per collection, off the query clock):
    * [[Bm25.Standing]] for the postings gates + eligible statistics,
    * plus `posToks` — the keep-stopword positional postings
    * `(doc_id, pos, tok)` behind phrase/proximity gates. */
  final case class Standing(bm25: Bm25.Standing, posToks: DataFrame)
}
