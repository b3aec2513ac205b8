package graft

import graft.operators.Phrase

/** Positional phrase search: exact adjacency, repeated-word phrases,
  * overlapping matches, and the map-side pruning plan shape. */
class PhraseSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "big data wins and big data scales"), // two matches
    (2L, "big rigs carry data"),               // words present, not adjacent
    (3L, "the data big flip"),                 // reversed order: no match
    (4L, "big data"),                          // match at position 0
    (5L, "zz big big data yy"))                // match not at the first 'big'
    .toDF("doc_id", "text")

  test("golden: adjacency required, 0-based first position, " +
      "multiple matches counted") {
    val got = Phrase.phraseSearch(docs, "doc_id", "text",
        Seq("big", "data"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == Map(1L -> ((2L, 0L)), 4L -> ((1L, 0L)),
      5L -> ((1L, 2L))), s"$got")
  }

  test("repeated-word phrase cannot false-positive on a single " +
      "occurrence; overlapping matches are counted") {
    val d = Seq(
      (1L, "go go go"),      // 'go go' matches at 0 and 1 (overlap)
      (2L, "go stop go"))    // no adjacent pair
      .toDF("doc_id", "text")
    val got = Phrase.phraseSearch(d, "doc_id", "text", Seq("go", "go"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == Map(1L -> ((2L, 0L))), s"$got")
  }

  test("plan: phrase words prune map-side via a broadcast join; the " +
      "corpus token stream never hash-shuffles before the prune") {
    val p = Phrase.phraseSearch(docs, "doc_id", "text",
        Seq("big", "data"))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }
}
