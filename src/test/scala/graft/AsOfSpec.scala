package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOf

/** As-of join: golden semantics (inclusive match, per-key isolation,
  * unmatched-left NULLs), parity with the brute-force inequality
  * formulation, and the no-pair-explosion plan shape. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("golden: most recent right at or before each left row, per key") {
    val left = Seq(
      (1L, "u1", ts(100)), (2L, "u1", ts(205)), (3L, "u1", ts(50)),
      (4L, "u2", ts(150)))
      .toDF("event_id", "k", "lts")
    val right = Seq(
      ("u1", ts(100), 10L), ("u1", ts(200), 20L), ("u2", ts(160), 30L))
      .toDF("k", "rts", "payload")
    val got = AsOf.joinAsOf(left, right, Seq("k"), "lts", "rts",
        Seq("payload"))
      .select("event_id", "asof_payload").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
      .toMap
    assert(got(1L) === Some(10L), "equal timestamps match (inclusive)")
    assert(got(2L) === Some(20L), "latest at-or-before wins")
    assert(got(3L) === None, "no prior right row -> NULL")
    assert(got(4L) === None, "keys never cross (u2's click is later)")
  }

  test("parity with the brute-force inequality join on a generated frame") {
    val rnd = new scala.util.Random(7)
    val left = (1L to 300L).map(i =>
      (i, s"u${rnd.nextInt(9)}", ts(rnd.nextInt(1000).toLong)))
      .toDF("event_id", "k", "lts")
    // unique (k, rts): the as-of contract
    val right = (1L to 200L).map(i =>
        (s"u${rnd.nextInt(9)}", ts(rnd.nextInt(1000).toLong), i))
      .toDF("k", "rts", "pl")
      .groupBy("k", "rts").agg(max("pl").as("pl"))
    val got = AsOf.joinAsOf(left, right, Seq("k"), "lts", "rts", Seq("pl"))
      .select("event_id", "asof_pl").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val brute = left.as("l")
      .join(right.as("r"), $"l.k" === $"r.k" && $"l.lts" >= $"r.rts", "left")
      .groupBy($"l.event_id")
      .agg(max_by(struct($"r.rts", $"r.pl"), $"r.rts").as("m"))
      .select($"event_id", $"m.pl")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got.keySet === brute.keySet)
    got.foreach { case (id, v) => assert(v === brute(id), s"event $id") }
  }

  test("plan: one key shuffle + window — no nested-loop or cartesian join") {
    val left = Seq((1L, "u1", ts(10))).toDF("event_id", "k", "lts")
    val right = Seq(("u1", ts(5), 1L)).toDF("k", "rts", "payload")
    val p = AsOf.joinAsOf(left, right, Seq("k"), "lts", "rts", Seq("payload"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Window"), p)
  }
}
