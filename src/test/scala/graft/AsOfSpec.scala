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

  test("NULL keys never match, on all three as-of forms " +
      "(equality-join semantics, not null-groups-together)") {
    val left = Seq((1L, Option("a"), 100L), (2L, Option.empty[String], 100L))
      .toDF("event_id", "k", "t")
    val right = Seq((Option("a"), 50L, 7L), (Option.empty[String], 50L, 9L))
      .toDF("k", "t", "pl")
    def check(m: Map[Long, Option[Any]], form: String): Unit = {
      assert(m(1L) === Some(7L), s"$form: keyed row matches")
      assert(m(2L) === None, s"$form: NULL-key left row must NOT " +
        "match the NULL-key right row")
    }
    check(AsOf.joinAsOf(left, right, Seq("k"), "t", "t", Seq("pl"))
      .select("event_id", "asof_pl").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap, "window")
    check(AsOf.joinAsOfBucketed(left, right, Seq("k"), "t", "t",
        Seq("pl"), bucketWidth = 10L)
      .select("event_id", "asof_pl").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap, "bucketed")
    check(graft.plans.AsOfExec.joinAsOfExec(left, right, "k", "t",
        Seq("pl"))
      .select("event_id", "pl").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap, "exec")
  }

  test("forward as-of: first right at or AFTER, per key, via negation") {
    val left = Seq((1L, "u1", 100L), (2L, "u1", 205L), (3L, "u1", 300L),
        (4L, "u2", 150L)).toDF("event_id", "k", "t")
    val right = Seq(("u1", 100L, 10L), ("u1", 250L, 20L),
        ("u2", 140L, 30L)).toDF("k", "t", "pl")
    val got = AsOf.joinAsOfForward(left, right, Seq("k"), "t", "t",
        Seq("pl"))
      .select("event_id", "asof_pl").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
      .toMap
    assert(got(1L) === Some(10L), "equal timestamps match (inclusive)")
    assert(got(2L) === Some(20L), "earliest at-or-after wins")
    assert(got(3L) === None, "no later right row -> NULL")
    assert(got(4L) === None, "keys never cross (u2's purchase is earlier)")
    // typed guard on non-integral ticks
    val ex = intercept[IllegalArgumentException] {
      AsOf.joinAsOfForward(
        left.withColumn("t", timestamp_micros(col("t"))), right,
        Seq("k"), "t", "t", Seq("pl"))
    }
    assert(ex.getMessage.contains("integral"))
  }

  test("custom AsOfJoinExec node: output-identical to the window form " +
      "on random frames, plans as the custom operator, golden edges") {
    import graft.plans.AsOfExec
    val rnd = new scala.util.Random(11)
    val left = (1L to 400L).map(i =>
      (i, s"u${rnd.nextInt(7)}", rnd.nextInt(1000).toLong))
      .toDF("event_id", "k", "t")
    val right = (1L to 250L).map(i =>
        (s"u${rnd.nextInt(9)}", rnd.nextInt(1000).toLong, i))
      .toDF("k", "t", "pl")
      .groupBy("k", "t").agg(max("pl").as("pl")) // unique (k, t)
    val exec = AsOfExec.joinAsOfExec(left, right, "k", "t", Seq("pl"))
    // the physical plan IS the custom node (strategy registered;
    // SparkPlan.nodeName strips the Exec suffix)
    val p = exec.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin "), s"custom node missing:\n$p")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"), p)
    val got = exec.select("event_id", "pl").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val ref = AsOf.joinAsOf(
        left.withColumn("lts", timestamp_micros(col("t"))),
        right.withColumn("rts", timestamp_micros(col("t"))),
        Seq("k"), "lts", "rts", Seq("pl"))
      .select("event_id", "asof_pl").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got == ref)
    // golden edges: inclusive equal-ts, NULL before first, key isolation
    val gl = Seq((1L, "a", 100L), (2L, "a", 99L), (3L, "b", 500L))
      .toDF("event_id", "k", "t")
    val gr = Seq(("a", 100L, 7L), ("c", 1L, 9L)).toDF("k", "t", "pl")
    val g = AsOfExec.joinAsOfExec(gl, gr, "k", "t", Seq("pl"))
      .select("event_id", "pl").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(g == Map(1L -> Some(7L), 2L -> None, 3L -> None), s"$g")
    // empty right: all NULLs, no crash
    val e = AsOfExec.joinAsOfExec(gl, gr.filter(lit(false)), "k", "t",
        Seq("pl"))
      .select("pl").collect().map(r => Option(r.get(0)))
    assert(e.length == 3 && e.forall(_.isEmpty))
    // typed guard: non-long ts refuses
    val ex = intercept[IllegalArgumentException] {
      AsOfExec.joinAsOfExec(
        gl.withColumn("t", timestamp_micros(col("t"))), gr, "k", "t",
        Seq("pl"))
    }
    assert(ex.getMessage.contains("LocalType".replace("Local", "Long")))
    // both sides from the SAME base relation (shared exprIds): the
    // wrapper's fresh-id alias projection keeps references resolvable
    val base = Seq((1L, "a", 10L, 5L), (2L, "a", 20L, 6L),
        (3L, "b", 30L, 7L)).toDF("event_id", "k", "t", "w")
    val same = AsOfExec.joinAsOfExec(
        base.select("event_id", "k", "t"),
        base.select(col("k"), col("t"), col("w").as("pl")),
        "k", "t", Seq("pl"))
      .select("event_id", "pl").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(same == Map(1L -> Some(5L), 2L -> Some(6L), 3L -> Some(7L)),
      s"$same")
  }

  test("forward as-of through the custom node: identical to the " +
      "negation-delegated window form on random frames; original ticks " +
      "re-emitted") {
    import graft.plans.AsOfExec
    val rnd = new scala.util.Random(23)
    val left = (1L to 400L).map(i =>
      (i, s"u${rnd.nextInt(7)}", rnd.nextInt(1000).toLong))
      .toDF("event_id", "k", "t")
    val right = (1L to 250L).map(i =>
        (s"u${rnd.nextInt(9)}", rnd.nextInt(1000).toLong, i))
      .toDF("k", "t", "pl")
      .groupBy("k", "t").agg(max("pl").as("pl"))
    val exec = AsOfExec.joinAsOfForwardExec(left, right, "k", "t",
      Seq("pl"))
    val p = exec.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin "), s"custom node missing:\n$p")
    // the left's ticks come back un-negated
    assert(exec.select("event_id", "t").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      left.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap)
    val got = exec.select("event_id", "pl").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val ref = AsOf.joinAsOfForward(left, right, Seq("k"), "t", "t",
        Seq("pl"))
      .select("event_id", "asof_pl").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got == ref)
    // payload must not smuggle the ts column (it would come back negated)
    val ex = intercept[IllegalArgumentException] {
      AsOfExec.joinAsOfForwardExec(left, right, "k", "t", Seq("t", "pl"))
    }
    assert(ex.getMessage.contains("alias"))
  }

  test("bucketed form is output-identical under one dominant key, and " +
      "its row-level window partitions by (key, bucket)") {
    val rnd = new scala.util.Random(11)
    // 90% of rows on ONE key — the shape that serializes joinAsOf
    val left = (1L to 400L).map { i =>
      val k = if (rnd.nextInt(10) == 0) s"u${rnd.nextInt(5)}" else "hot"
      (i, k, ts(rnd.nextInt(5000).toLong))
    }.toDF("event_id", "k", "lts")
    val right = (1L to 300L).map { i =>
        val k = if (rnd.nextInt(10) == 0) s"u${rnd.nextInt(5)}" else "hot"
        (k, ts(rnd.nextInt(5000).toLong), i)
      }.toDF("k", "rts", "pl")
      .groupBy("k", "rts").agg(max("pl").as("pl"))
    def collectMatches(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "asof_pl", "asof_rts").collect()
        .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    val plain = collectMatches(
      AsOf.joinAsOf(left, right, Seq("k"), "lts", "rts", Seq("pl")))
    // widths straddling the data span: 100 buckets, few-bucket, and a
    // width so wide everything lands in one bucket (degenerates to
    // joinAsOf exactly)
    for (width <- Seq(50L * 1000000L, 1700L * 1000000L, 10000L * 1000000L)) {
      val bucketed = AsOf.joinAsOfBucketed(left, right, Seq("k"),
        "lts", "rts", Seq("pl"), width)
      assert(collectMatches(bucketed) === plain, s"width=$width")
    }
    // plan shape: the row-level union-window partitions by
    // (key, __bucket), so a hot key's timeline spreads across buckets
    val p = AsOf.joinAsOfBucketed(left, right, Seq("k"), "lts", "rts",
      Seq("pl"), 50L * 1000000L).queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    val windowLines = p.linesIterator.filter(_.contains("windowspecdefinition"))
      .toSeq
    assert(windowLines.exists(l => l.contains("__bucket") &&
        l.contains("windowspecdefinition(k")),
      s"no (key, bucket)-partitioned window in:\n$p")
  }

  test("bucketed form handles integral tick columns and negative ticks") {
    val left = Seq((1L, "k", -5L), (2L, "k", 3L), (3L, "k", 250L))
      .toDF("event_id", "k", "lts")
    val right = Seq(("k", -7L, 70L), ("k", 2L, 20L), ("k", 100L, 10L))
      .toDF("k", "rts", "pl")
    val got = AsOf.joinAsOfBucketed(left, right, Seq("k"), "lts", "rts",
        Seq("pl"), 10L)
      .select("event_id", "asof_pl").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got === Map(1L -> Some(70L), 2L -> Some(20L), 3L -> Some(10L)))
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
