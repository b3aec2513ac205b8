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
