package graft

import org.apache.spark.sql.functions._

import graft.operators.Spell

/** SymSpell deletion-variant correction: all three edit kinds at
  * distance 1 are found, distance-2 lookalikes are rejected by the
  * verify, and ranking is df-argmax with lexicographic ties. */
class SpellSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Seq(
    ("batch", 100L), ("botch", 40L), ("match", 100L),
    ("watch", 5L), ("catchy", 90L))
    .toDF("term", "df")

  private def correct(qs: String*) =
    Spell.didYouMean(vocab, qs.toDF("q"), "q")
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getLong(2), r.getInt(3))).toMap

  test("substitution, insertion, and deletion at distance 1 all " +
      "resolve; distance 2 yields nothing") {
    val got = correct("patch", "batchh", "atch", "xxtch")
    assert(got("patch")._1 == "batch" || got("patch")._1 == "match")
    assert(got("batchh") == (("batch", 100L, 1)))
    // "atch": deletion-neighbors batch/match tie at df=100 ->
    // lexicographically smallest wins
    assert(got("atch") == (("batch", 100L, 1)))
    assert(!got.contains("xxtch"), s"distance-2 matched: $got")
  }

  test("exact vocabulary hits come back at distance 0 with their df") {
    val got = correct("watch")
    assert(got("watch") == (("watch", 5L, 0)))
  }

  test("ranking is df-argmax: a low-df nearer spelling loses to a " +
      "high-df alternative at the same distance") {
    // "botch" (df 40) vs "batch" (df 100): both distance 1 from "bitch"-
    // like inputs; use "bstch" (sub at pos 2) -> batch & botch both d1
    val got = correct("bstch")
    assert(got("bstch")._1 == "batch" && got("bstch")._2 == 100L)
  }
}
