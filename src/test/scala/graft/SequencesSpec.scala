package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Sequences

/** Sequence-dataset construction: context ordering, frame bounds,
  * ts tie-breaks, and the no-context drop rule. */
class SequencesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("golden: oldest-first contexts bounded by contextLen; " +
      "no-context events dropped; keys isolated") {
    val ev = Seq(
      (1L, "u1", ts(10), "view"),
      (2L, "u1", ts(20), "click"),
      (3L, "u1", ts(30), "view"),
      (4L, "u1", ts(40), "purchase"),
      (5L, "u1", ts(50), "view"),
      (6L, "u2", ts(15), "error")) // sole event: no context -> dropped
      .toDF("event_id", "user_id", "ets", "event_type")
    val got = Sequences.nextEventExamples(ev, "user_id", "ets",
        "event_id", "event_type", contextLen = 3)
      .collect().map(r => r.getLong(1) ->
        (r.getSeq[String](3), r.getInt(4), r.getString(5))).toMap
    assert(got.keySet === Set(2L, 3L, 4L, 5L))
    assert(got(2L) === ((Seq("view"), 1, "click")))
    assert(got(3L) === ((Seq("view", "click"), 2, "view")))
    assert(got(4L) === ((Seq("view", "click", "view"), 3, "purchase")))
    // frame caps at 3: event 1 ages out of event 5's context
    assert(got(5L) === ((Seq("click", "view", "purchase"), 3, "view")))
  }

  test("equal timestamps break ties by event id, deterministically") {
    val ev = Seq(
      (7L, "u", ts(10), "a"),
      (8L, "u", ts(10), "b"), // same ts as 7 -> 7 precedes (lower id)
      (9L, "u", ts(20), "c"))
      .toDF("event_id", "user_id", "ets", "event_type")
    val got = Sequences.nextEventExamples(ev, "user_id", "ets",
        "event_id", "event_type", contextLen = 5)
      .collect().map(r => r.getLong(1) -> r.getSeq[String](3)).toMap
    assert(got(8L) === Seq("a"))
    assert(got(9L) === Seq("a", "b"))
  }
}
