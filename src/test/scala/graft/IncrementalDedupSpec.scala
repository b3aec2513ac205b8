package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Skew}

/** Incremental exact dedup semantics and the skew-probe advisor. */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  test("exactIncremental: in-batch keep-first, then history anti-join") {
    val history = Seq((1L, "aaa"), (2L, "bbb")).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "aaa"), // dup of history -> dropped
      (11L, "ccc"), (12L, "ccc"), // in-batch dup -> keep 11
      (13L, "ddd"))
      .toDF("doc_id", "text")
    val got = Dedup.exactIncremental(incoming, history, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(11L, 13L), got)
  }

  test("exactIncremental: an in-batch dup of a history doc dies even " +
      "when the batch's keeper is not the history copy") {
    val history = Seq((1L, "xxx")).toDF("doc_id", "text")
    val incoming = Seq((5L, "xxx"), (6L, "xxx")).toDF("doc_id", "text")
    assert(Dedup.exactIncremental(incoming, history, "doc_id", "text")
      .count() == 0L)
  }

  test("exactIncremental keeps all incoming columns") {
    val history = Seq((1L, "aaa", "en")).toDF("doc_id", "text", "lang")
    val incoming = Seq((2L, "bbb", "de")).toDF("doc_id", "text", "lang")
    val rows = Dedup.exactIncremental(incoming, history, "doc_id", "text")
      .collect()
    assert(rows.length == 1 && rows(0).getString(2) == "de")
  }

  test("minhashIncremental: cross-corpus near-dups found, in-batch " +
      "and in-history pairs NOT emitted, low-jaccard collisions " +
      "verified away") {
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark forest tonight"
    val history = Seq(
      (1L, base),
      (2L, base), // in-history dup of 1 — must NOT pair
      (3L, "completely different text about spark shuffle exchanges " +
        "and broadcast joins in distributed query engines"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (10L, base + " extra tail"), // near-dup of history 1 AND 2
      (11L, base + " extra tail"), // in-batch dup of 10 — no pair
      (12L, "unrelated arrival document mentioning neither corpus " +
        "covering entirely novel subject matter and vocabulary"))
      .toDF("doc_id", "text")
    val got = Dedup.minhashIncremental(incoming, history,
        "doc_id", "text", n = 3, numHashes = 16, bands = 8,
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L)), got)
  }

  test("minhashIncremental property: equals the union self-join's " +
      "cross-boundary pairs under the same banding, on a seeded " +
      "random corpus with injected near-dups") {
    val pool = ("alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon").split(" ")
    for (seed <- 1 to 2) {
      val rnd = new scala.util.Random(seed)
      def sentence() =
        (0 until 12 + rnd.nextInt(10)).map(_ => pool(rnd.nextInt(pool.length)))
          .mkString(" ")
      val histRows = (1L to 20L).map(i => (i, sentence()))
      // incoming ids 101+: half fresh, half near-dups of history docs
      val incRows = (101L to 110L).map(i => (i, sentence())) ++
        (111L to 120L).map { i =>
          (i, histRows((i % 20).toInt)._2 + " tail suffix words")
        }
      val history = histRows.toDF("doc_id", "text")
        .repartition(1 + rnd.nextInt(4))
      val incoming = incRows.toDF("doc_id", "text")
        .repartition(1 + rnd.nextInt(4))
      val inc = Dedup.minhashIncremental(incoming, history,
          "doc_id", "text", n = 3, numHashes = 16, bands = 8,
          threshold = 0.3)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          math.rint(r.getDouble(2) * 1e9))).toSet
      val all = Dedup.minhashNearDups(
          history.unionByName(incoming), "doc_id", "text",
          n = 3, numHashes = 16, bands = 8, threshold = 0.3)
        .collect()
      val cross = all.flatMap { r =>
        val (a, b, j) = (r.getLong(0), r.getLong(1),
          math.rint(r.getDouble(2) * 1e9))
        if (a <= 100L && b > 100L) Some((b, a, j)) else None
      }.toSet
      assert(inc == cross, s"seed=$seed: inc=$inc cross=$cross")
    }
  }

  test("skew probe: ratio is max/mean and the cut is (cnt desc, key)") {
    // key "hot" 6x, "a" 2x, "b" 2x, "c" 2x -> mean 3, ratio 2.0
    val df = (Seq.fill(6)("hot") ++ Seq("a", "a", "b", "b", "c", "c"))
      .toDF("k")
    val rows = Skew.probe(df, "k", topK = 3).collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("hot", "a", "b"))
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    assert(rows(0).getLong(2) == 6L)
    assert(rows(0).getLong(3) == 4L) // n_keys
    assert(rows(0).getLong(4) == 12L) // total
    assert(rows(0).getDouble(5) == 2.0) // 6 / (12/4)
  }

  test("joinCardinality: est_rows equals the materialized join size " +
      "and top contributors rank by product") {
    val left = (Seq.fill(4)("hot") ++ Seq("a", "a", "b")).toDF("k")
    val right = (Seq.fill(3)("hot") ++ Seq("a", "c")).toDF("k")
    val rows = Skew.joinCardinality(left, "k", right, "k", topK = 2)
      .collect()
    // hot: 4*3=12, a: 2*1=2; b/c don't match
    assert(rows.map(r => (r.getInt(0), r.getString(1), r.getLong(4)))
      .toSeq == Seq((1, "hot", 12L), (2, "a", 2L)), rows.toSeq.toString)
    val actual = left.join(right, "k").count()
    assert(rows(0).getLong(5) == actual && actual == 14L)
    assert(rows(0).getLong(6) == 2L) // n_match_keys
  }

  test("skew probe plan: no rank window over the key-count relation") {
    val df = Seq("a", "b", "a").toDF("k")
    val p = Skew.probe(df, "k", topK = 2)
      .queryExecution.executedPlan.toString
    assert(!p.contains("windowspecdefinition"), p)
    assert(p.contains("ObjectHashAggregate"), p)
  }
}
