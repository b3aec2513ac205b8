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

  test("proximity: ordered within-slop pairs only; gap measured; " +
      "reverse order and out-of-window occurrences excluded") {
    val d = Seq(
      (1L, "big fast query"),              // gap 2 <= 4: match
      (2L, "query big"),                   // reversed: no match
      (3L, "big aa bb cc dd ee query"),    // gap 6 > 4: no match
      (4L, "big query big fast query"))    // pairs: (0,1),(2,4),(0? 4 gap4)
      .toDF("doc_id", "text")
    val got = Phrase.proximitySearch(d, "doc_id", "text",
        "big", "query", slop = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // doc 4 positions: big@0, query@1, big@2, query@4 →
    // pairs (0,1) g1, (0,4) g4, (2,4) g2 = 3 pairs, min gap 1
    assert(got == Map(1L -> ((1L, 2L)), 4L -> ((3L, 1L))), s"$got")
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
