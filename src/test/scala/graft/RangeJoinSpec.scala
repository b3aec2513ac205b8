package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Bucketed range join: boundary semantics, parity with the naive
  * inequality join, and the equi-join plan shape. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("golden: inclusive start, exclusive end, multi-bucket spans, " +
      "key isolation") {
    val points = Seq(
      (1L, "k1", 100L), (2L, "k1", 199L), (3L, "k1", 200L),
      (4L, "k1", 350L), (5L, "k2", 150L))
      .toDF("pid", "k", "ts")
    val iv = Seq(
      ("k1", 100L, 200L, "a"),   // [100, 200): pids 1, 2 — NOT 3
      ("k1", 90L, 400L, "b"),    // spans 4 buckets at width 100
      ("k2", 100L, 160L, "c"),
      ("k1", 300L, 300L, "empty")) // end <= start: matches nothing
      .toDF("k", "s", "e", "tag")
    val got = RangeJoin.pointInInterval(points, iv, Seq("k"), "ts", "s", "e",
        bucketWidth = 100L)
      .select("pid", "tag").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set(
      (1L, "a"), (2L, "a"),
      (1L, "b"), (2L, "b"), (3L, "b"), (4L, "b"),
      (5L, "c")))
  }

  test("parity with the naive inequality join; no duplicate pairs") {
    val rnd = new scala.util.Random(11)
    val points = (1L to 400L).map(i =>
      (i, s"k${rnd.nextInt(6)}", rnd.nextInt(5000).toLong))
      .toDF("pid", "k", "ts")
    val iv = (1L to 120L).map { i =>
      val s = rnd.nextInt(5000).toLong
      (i, s"k${rnd.nextInt(6)}", s, s + 1 + rnd.nextInt(700).toLong)
    }.toDF("iid", "k", "s", "e")
    for (width <- Seq(64L, 250L, 1000L)) {
      val got = RangeJoin.pointInInterval(points, iv, Seq("k"), "ts",
          "s", "e", width)
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val brute = points.as("p").join(iv.as("i"),
          $"p.k" === $"i.k" && $"p.ts" >= $"i.s" && $"p.ts" < $"i.e")
        .select($"pid", $"iid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length === got.toSet.size, s"duplicate pairs at width $width")
      assert(got.toSet === brute.toSet, s"mismatch at width $width")
    }
  }

  test("interval overlap: owner-bucket emits each pair ONCE even when " +
      "a pair spans many buckets; equals brute force; half-open edges") {
    // golden: a pair spanning 10 buckets at width 10 must emit once
    val l1 = Seq((1L, "k", 0L, 100L)).toDF("lid", "k", "ls", "le")
    val r1 = Seq((1L, "k", 5L, 95L), (2L, "k", 100L, 110L))
      .toDF("rid", "k", "rs", "re")
    val g = RangeJoin.intervalOverlap(l1, r1, Seq("k"), "ls", "le",
        "rs", "re", bucketWidth = 10L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    // rid=2 touches at le=100=rs: half-open -> NOT an overlap
    assert(g.toSeq == Seq((1L, 1L)), g.toSeq)
    // randomized parity with the brute-force inequality join
    val rnd = new scala.util.Random(23)
    val li = (1L to 150L).map { i =>
      val s = rnd.nextInt(5000).toLong
      (i, s"k${rnd.nextInt(5)}", s, s + 1 + rnd.nextInt(800).toLong)
    }.toDF("lid", "k", "ls", "le")
    val ri = (1L to 150L).map { i =>
      val s = rnd.nextInt(5000).toLong
      (i, s"k${rnd.nextInt(5)}", s, s + 1 + rnd.nextInt(800).toLong)
    }.toDF("rid", "k", "rs", "re")
    for (width <- Seq(64L, 300L, 1200L)) {
      val got = RangeJoin.intervalOverlap(li, ri, Seq("k"), "ls", "le",
          "rs", "re", width)
        .select("lid", "rid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val brute = li.as("l").join(ri.as("r"),
          $"l.k" === $"r.k" && $"l.ls" < $"r.re" && $"r.rs" < $"l.le")
        .select($"lid", $"rid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length === got.toSet.size, s"duplicate pairs at width $width")
      assert(got.toSet === brute.toSet, s"mismatch at width $width")
    }
  }

  test("plan: equi-join on (key, bucket) — no nested-loop or cartesian") {
    val points = Seq((1L, "k", 5L)).toDF("pid", "k", "ts")
    val iv = Seq(("k", 0L, 10L)).toDF("k", "s", "e")
    val p = RangeJoin.pointInInterval(points, iv, Seq("k"), "ts", "s", "e", 10L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
