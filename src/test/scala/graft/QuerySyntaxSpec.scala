package graft

import graft.search.QuerySyntax

/** The search-box grammar: parse shape and the composed gate
  * semantics over a golden corpus. */
class QuerySyntaxSpec extends SparkSpec {
  import spark.implicits._

  test("parse: quoted phrases tokenize, +/- prefixes route to " +
      "must/must_not, bare terms score; dangling prefixes ignored") {
    val p = QuerySyntax.parse(
      "\"Big Data\" +table -error spark hash + -")
    assert(p.phrases == Seq(Seq("big", "data")), p.phrases)
    assert(p.must == Seq("table") && p.mustNot == Seq("error"))
    assert(p.terms == Seq("spark", "hash"), p.terms)
    // multiple phrases, empty quotes dropped (tokens shorter than the
    // tokenizer's minimum length vanish with them)
    val p2 = QuerySyntax.parse("\"alpha beta\" \"\" \"gamma delta\" term")
    assert(p2.phrases.length == 2 && p2.terms == Seq("term"))
    intercept[IllegalArgumentException](QuerySyntax.parse("  "))
  }

  test("parse v2: slop phrases carry their k, boosts attach to bare " +
      "terms (which still score), and the v1 legs are unchanged") {
    val p = QuerySyntax.parse(
      "\"big data\"~3 +table -error spark^2 hash boost^1.5")
    assert(p.slops == Seq((Seq("big", "data"), 3)), p.slops)
    assert(p.phrases.isEmpty)
    assert(p.must == Seq("table") && p.mustNot == Seq("error"))
    assert(p.terms == Seq("spark", "hash", "boost"), p.terms)
    assert(p.boosts == Map("spark" -> 2.0, "boost" -> 1.5), p.boosts)
    // a slop phrase with fewer than 2 tokens is dropped (nothing to
    // pair); slop 0 likewise
    assert(QuerySyntax.parse("\"one\"~5 x").slops.isEmpty)
    // mixed exact + sloppy quotes in one query (>=2-char words — the
    // tokenizer drops shorter tokens)
    val p2 = QuerySyntax.parse("\"aa bb\" \"cc dd\"~2 term")
    assert(p2.phrases == Seq(Seq("aa", "bb")) &&
      p2.slops == Seq((Seq("cc", "dd"), 2)))
  }

  test("search v2: the proximity gate admits gapped ordered pairs an " +
      "exact phrase rejects, bounds the gap at k, rejects reversed " +
      "order; a boost reorders the ranking") {
    val docs = Seq(
      (1L, "big data table spark processing"),     // gap 1 (exact)
      (2L, "big fast new data table spark runs"),  // gap 3 -> in at k=3
      (3L, "big aaa bbb ccc ddd data table spark deep"), // gap 5 -> out
      (4L, "data big table spark wrong order"),    // reversed -> out
      (5L, "big data table nothing to rank"))      // no scoring term
      .toDF("doc_id", "text")
    val got = QuerySyntax.search(docs, "doc_id", "text",
        "\"big data\"~3 +table spark", k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L), got.toString)
    // boost flips a ranking: doc A has the rare term once, doc B the
    // common term twice — boosting the common term must lift B over A
    val docs2 = Seq(
      (1L, "alpha beta beta gamma"),
      (2L, "alpha zeta gamma gamma"))
      .toDF("doc_id", "text")
    def top(q: String): Long =
      QuerySyntax.search(docs2, "doc_id", "text", q, k = 1)
        .collect()(0).getLong(0)
    val base = top("beta gamma")
    val boosted = top("beta gamma^100")
    assert(base != boosted,
      s"boost should reorder: base=$base boosted=$boosted")
  }

  test("field filters: `field:value` gates by declared column " +
      "equality before everything else; unknown fields fail loudly") {
    val p = QuerySyntax.parse("lang:en source:web spark")
    assert(p.fields == Seq(("lang", "en"), ("source", "web")), p.fields)
    assert(p.terms == Seq("spark"))
    val docs = Seq(
      (1L, "spark rows here", "en"),
      (2L, "spark rows here", "de"),
      (3L, "nothing relevant", "en"))
      .toDF("doc_id", "text", "lang")
    val got = QuerySyntax.search(docs, "doc_id", "text",
        "lang:en spark", k = 10, fieldCols = Map("lang" -> "lang"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L), got.toString)
    intercept[IllegalArgumentException](
      QuerySyntax.search(docs, "doc_id", "text", "nope:x spark",
        k = 10, fieldCols = Map("lang" -> "lang")))
  }

  test("search: phrase gate, must conjunction, and exclusion compose " +
      "filter-then-rank; a doc missing any gate never ranks") {
    val docs = Seq(
      (1L, "big data table spark processing"),   // all gates pass
      (2L, "big data table spark error logged"), // -error kills it
      (3L, "big data spark only no required"),   // +table kills it
      (4L, "data big table spark wrong order"),  // phrase order wrong
      (5L, "big data table nothing to score"))   // passes gates, no
                                                 // query term -> unscored
      .toDF("doc_id", "text")
    val got = QuerySyntax.search(docs, "doc_id", "text",
        "\"big data\" +table -error spark", k = 10)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L), got.toString)
    // a query with no bare scoring terms is rejected loudly
    intercept[IllegalArgumentException](
      QuerySyntax.search(docs, "doc_id", "text", "\"big data\" +table",
        k = 10))
  }
}
