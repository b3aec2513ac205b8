package graft

import graft.operators.Interleave

/** Deterministic team-draft: alternation, dedup across teams,
  * exhaustion fallback, click crediting. */
class InterleaveSpec extends SparkSpec {
  import spark.implicits._

  private val runA = Seq((1, 1, 1L), (1, 2, 2L), (1, 3, 3L))
    .toDF("query_id", "rank", "doc_id")
  private val runB = Seq((1, 1, 2L), (1, 2, 4L))
    .toDF("query_id", "rank", "doc_id")

  test("draft alternates A,B,…, skips docs the other team already " +
      "placed, and falls back when a team exhausts") {
    val clicks = Seq((1, 2L), (1, 3L)).toDF("query_id", "doc_id")
    val got = Interleave.teamDraft(runA, runB, clicks, depth = 10)
      .collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getString(3),
        r.getBoolean(4)))
      .sortBy(_._1)
    // A takes 1; B takes 2; A skips 2, takes 3; B takes 4; both
    // exhausted -> page stops at 4
    assert(got.toSeq == Seq(
      (1, 1L, "A", false), (2, 2L, "B", true),
      (3, 3L, "A", true), (4, 4L, "B", false)), got.mkString(","))
  }

  test("verdict credits the contributing team; symmetric clicks tie, " +
      "extra A-side clicks flip the winner") {
    val tie = Interleave.verdict(Interleave.teamDraft(runA, runB,
        Seq((1, 2L), (1, 3L)).toDF("query_id", "doc_id")))
      .collect().head
    assert(tie.getLong(1) == 1 && tie.getLong(2) == 1 &&
      tie.getString(3) == "tie")
    val aWins = Interleave.verdict(Interleave.teamDraft(runA, runB,
        Seq((1, 1L), (1, 3L)).toDF("query_id", "doc_id")))
      .collect().head
    assert(aWins.getLong(1) == 2 && aWins.getLong(2) == 0 &&
      aWins.getString(3) == "A")
  }

  test("one team entirely absent for a query: the other fills every " +
      "position") {
    val onlyA = Interleave.teamDraft(runA,
        Seq((2, 1, 9L)).toDF("query_id", "rank", "doc_id"),
        Seq.empty[(Int, Long)].toDF("query_id", "doc_id"), depth = 5)
      .filter($"query_id" === 1)
      .collect().map(r => (r.getLong(2), r.getString(3)))
    assert(onlyA.toSeq == Seq((1L, "A"), (2L, "A"), (3L, "A")),
      onlyA.mkString(","))
  }
}
