package graft

import org.apache.spark.sql.functions._

import graft.operators.IrMetrics

/** Golden-value metric tests ported from the reference
  * (packages/shared/benchmarks/metrics.py examples and
  * tests/unit/benchmarks/test_metrics.py). */
class IrMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def run(results: Seq[(Int, Int, String)],
                  qrels: Seq[(Int, String, Int)],
                  ks: Seq[Int]): Map[(String, Int, Int), Double] = {
    val r = results.toDF("query_id", "rank", "doc_id")
    val q = qrels.toDF("query_id", "doc_id", "grade")
    IrMetrics.perQuery(r, q, ks).collect()
      .map(row => ((row.getString(1), row.getInt(2), row.getInt(0)),
        row.getDouble(3))).toMap
  }

  test("precision/recall/mrr/ap/ndcg goldens") {
    // run: q1 retrieves a,b,c,d,e in order
    val results = Seq((1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "d"), (1, 5, "e"))
    // relevant = {a, c, e} all grade>0
    val m1 = run(results, Seq((1, "a", 1), (1, "c", 1), (1, "e", 1)), Seq(5))
    assert(m1(("precision", 5, 1)) == 0.6) // metrics.py P@5 example
    assert(m1(("recall", 5, 1)) == 1.0)

    // recall with a relevant doc never retrieved: {a, c, f} -> 2/3
    val m2 = run(results, Seq((1, "a", 1), (1, "c", 1), (1, "f", 1)), Seq(5))
    assert(math.abs(m2(("recall", 5, 1)) - 2.0 / 3) < 1e-12)

    // MRR(['a','b','c'], {c}) = 1/3
    val m3 = run(Seq((1, 1, "a"), (1, 2, "b"), (1, 3, "c")),
      Seq((1, "c", 1)), Seq(5))
    assert(math.abs(m3(("mrr", 0, 1)) - 1.0 / 3) < 1e-12)

    // AP(['a','b','c','d'], {a,c}) = (1/1 + 2/3) / 2
    val m4 = run(Seq((1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "d")),
      Seq((1, "a", 1), (1, "c", 1)), Seq(5))
    assert(math.abs(m4(("ap", 0, 1)) - (1.0 + 2.0 / 3) / 2) < 1e-12)

    // nDCG@3(['a','b','c'], {a:3,b:1,c:2}) — computed from the formula
    val m5 = run(Seq((1, 1, "a"), (1, 2, "b"), (1, 3, "c")),
      Seq((1, "a", 3), (1, "b", 1), (1, "c", 2)), Seq(3))
    assert(math.abs(m5(("ndcg", 3, 1)) - 0.9725044904464192) < 1e-12)

    // compute_all_metrics docstring: ['a','b'], {a:3, c:2}, k=5
    val m6 = run(Seq((1, 1, "a"), (1, 2, "b")),
      Seq((1, "a", 3), (1, "c", 2)), Seq(5))
    assert(math.abs(m6(("precision", 5, 1)) - 0.2) < 1e-12)
    assert(math.abs(m6(("recall", 5, 1)) - 0.5) < 1e-12)
    assert(math.abs(m6(("ndcg", 5, 1)) - 0.7039180890341347) < 1e-12)
    assert(m6(("mrr", 0, 1)) == 1.0)
    assert(m6(("ap", 0, 1)) == 0.5)
  }

  test("query with no qrels scores zero everywhere") {
    val m = run(Seq((7, 1, "x"), (7, 2, "y")), Seq((8, "x", 2)), Seq(5))
    assert(m(("precision", 5, 7)) == 0.0)
    assert(m(("recall", 5, 7)) == 0.0)
    assert(m(("ndcg", 5, 7)) == 0.0)
    assert(m(("mrr", 0, 7)) == 0.0)
    assert(m(("ap", 0, 7)) == 0.0)
  }

  test("collapse keeps first hit per doc and re-ranks (metrics.py:12-41)") {
    val chunks = Seq((1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "c"))
      .toDF("query_id", "rank", "doc_id")
    val got = IrMetrics.collapseToDocs(chunks)
      .orderBy("rank").select("doc_id", "rank")
      .as[(String, Int)].collect().toSeq
    assert(got == Seq(("a", 1), ("b", 2), ("c", 3)))
  }

  test("macro average across two queries") {
    val res = Seq((1, 1, "a"), (1, 2, "b"), (2, 1, "x"))
    val qr = Seq((1, "a", 1), (2, "y", 1))
    val df = IrMetrics.macroAveraged(
      res.toDF("query_id", "rank", "doc_id"),
      qr.toDF("query_id", "doc_id", "grade"), Seq(5))
    val m = df.collect().map(r =>
      (r.getString(0), r.getInt(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    // q1: P@5 = 1/5, q2: 0 -> avg 0.1 over 2 queries
    assert(math.abs(m(("precision", 5))._1 - 0.1) < 1e-12)
    assert(m(("precision", 5))._2 == 2L)
  }

  test("array formulation == relational formulation, every metric") {
    // covers: graded docs, unjudged docs, a query with NO qrels, a
    // query with relevant docs never retrieved, duplicate-free ranks
    val res = Seq(
      (1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "d"),
      (2, 1, "x"), (2, 2, "y"),
      (3, 1, "p")) // query 3 has no qrels at all
    val qr = Seq(
      (1, "a", 3), (1, "c", 1), (1, "z", 2), // z relevant, not retrieved
      (2, "y", 1), (2, "x", 0)) // x judged non-relevant
    val ks = Seq(2, 5)
    val rDF = res.toDF("query_id", "rank", "doc_id")
    val qDF = qr.toDF("query_id", "doc_id", "grade")
    val rel = IrMetrics.macroAveraged(rDF, qDF, ks).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    val arrIn = rDF.groupBy("query_id")
      .agg(sort_array(collect_list(struct(col("rank"), col("doc_id"))))
        .as("hits"))
      .select(col("query_id"),
        transform(col("hits"), h => h.getField("doc_id")).as("docs"))
    val arr = IrMetrics.macroAveragedFromArrays(arrIn, qDF, ks).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    assert(rel.keySet == arr.keySet)
    rel.foreach { case (key, (v, n)) =>
      assert(arr(key)._2 == n, s"$key n_queries")
      assert(math.abs(arr(key)._1 - v) < 1e-12,
        s"$key: relational $v vs array ${arr(key)._1}")
    }
  }

  test("duplicate (query_id, doc_id) qrels: both paths agree via max(grade)") {
    val res = Seq((1, 1, "a"), (1, 2, "b"), (1, 3, "c"))
    // "a" judged twice (0 then 3 — max wins), "b" judged twice (1, 1)
    val qr = Seq((1, "a", 0), (1, "a", 3), (1, "b", 1), (1, "b", 1),
      (1, "z", 2), (1, "z", 2)) // unretrieved dup must not inflate n_relevant
    val ks = Seq(2, 5)
    val rDF = res.toDF("query_id", "rank", "doc_id")
    val qDF = qr.toDF("query_id", "doc_id", "grade")
    val dedupDF = qDF.groupBy("query_id", "doc_id")
      .agg(max("grade").as("grade"))
    val rel = IrMetrics.macroAveraged(rDF, qDF, ks).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val relDedup = IrMetrics.macroAveraged(rDF, dedupDF, ks).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val arrIn = rDF.groupBy("query_id")
      .agg(sort_array(collect_list(struct(col("rank"), col("doc_id"))))
        .as("hits"))
      .select(col("query_id"),
        transform(col("hits"), h => h.getField("doc_id")).as("docs"))
    val arr = IrMetrics.macroAveragedFromArrays(arrIn, qDF, ks).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(rel == relDedup, "duplicates must not change the relational path")
    assert(rel.keySet == arr.keySet)
    rel.foreach { case (key, v) =>
      assert(math.abs(arr(key) - v) < 1e-12,
        s"$key: relational $v vs array ${arr(key)}")
    }
    // sanity: recall@5 = 2/3 (a,b relevant+retrieved; z relevant, missed)
    assert(math.abs(rel(("recall", 5)) - 2.0 / 3.0) < 1e-12)
  }

  test("array == relational on randomized runs/qrels (seeded)") {
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 1 to 6) {
      val nQ = 1 + rnd.nextInt(4)
      val docs = ('a' to 'j').map(_.toString)
      val res = for {
        q <- 1 to nQ
        (d, i) <- rnd.shuffle(docs).take(1 + rnd.nextInt(8)).zipWithIndex
      } yield (q, i + 1, d)
      val qr = for {
        q <- 1 to nQ
        d <- docs if rnd.nextDouble() < 0.4
      } yield (q, d, rnd.nextInt(4)) // grades 0-3 incl judged-irrelevant
      val ks = Seq(1 + rnd.nextInt(3), 5)
      val rDF = res.toDF("query_id", "rank", "doc_id")
      val qDF = qr.toDF("query_id", "doc_id", "grade")
      val rel = IrMetrics.macroAveraged(rDF, qDF, ks).collect()
        .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
      val arrIn = rDF.groupBy("query_id")
        .agg(sort_array(collect_list(struct(col("rank"), col("doc_id"))))
          .as("hits"))
        .select(col("query_id"),
          transform(col("hits"), h => h.getField("doc_id")).as("docs"))
      val arr = IrMetrics.macroAveragedFromArrays(arrIn, qDF, ks).collect()
        .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
      assert(rel.keySet == arr.keySet, s"trial $trial keys")
      rel.foreach { case (key, v) =>
        assert(math.abs(arr(key) - v) < 1e-12,
          s"trial $trial $key: relational $v vs array ${arr(key)}")
      }
    }
  }

  test("pairedSignificance: means, deltas, sign counts, and the " +
      "paired t match a hand fold over the quantized per-query values") {
    // 3 queries, single relevant doc each; ranker A hits rank 1 on
    // q1/q2 and rank 2 on q3; ranker B hits rank 2, 3, 2.
    val runA = Seq((1, 1, "a"), (1, 2, "x"), (2, 1, "b"), (2, 2, "x"),
      (3, 1, "x"), (3, 2, "c")).toDF("query_id", "rank", "doc_id")
    val runB = Seq((1, 1, "x"), (1, 2, "a"), (2, 1, "x"), (2, 2, "y"),
      (2, 3, "b"), (3, 1, "x"), (3, 2, "c"))
      .toDF("query_id", "rank", "doc_id")
    val qrels = Seq((1, "a", 1), (2, "b", 1), (3, "c", 1))
      .toDF("query_id", "doc_id", "grade")
    val row = IrMetrics.pairedSignificance(runA, runB, qrels,
      "ndcg", 10).collect().head
    // per-query nDCG@10 (idcg = 1): A = 1, 1, 1/log2(3);
    // B = 1/log2(3), 1/2, 1/log2(3)
    def q(v: Double) = math.round(v * 1e6)
    val a = Seq(1.0, 1.0, 1.0 / (math.log(3) / math.log(2))).map(q)
    val b = Seq(1.0 / (math.log(3) / math.log(2)), 0.5,
      1.0 / (math.log(3) / math.log(2))).map(q)
    val d = a.zip(b).map { case (x, y) => x - y }
    val (n, sd, sdd) = (3.0, d.sum.toDouble, d.map(x => x * x).sum.toDouble)
    val varD = (sdd - sd * sd / n) / (n - 1)
    val tExp = (sd / n) / math.sqrt(varD / n)
    assert(row.getLong(0) == 3)
    assert(math.abs(row.getDouble(1) - a.sum / 1e6 / 3) < 1e-12) // mean_a
    assert(math.abs(row.getDouble(2) - b.sum / 1e6 / 3) < 1e-12) // mean_b
    assert(math.abs(row.getDouble(3) - sd / 1e6 / 3) < 1e-12)
    assert(math.abs(row.getDouble(4) - tExp) < 1e-9, s"t ${row.getDouble(4)} vs $tExp")
    assert(row.getLong(5) == 2 && row.getLong(6) == 0 &&
      row.getLong(7) == 1) // A wins q1/q2, ties q3
  }

  test("pairedSignificance: identical runs report zero delta, zero t, " +
      "all ties") {
    val run = Seq((1, 1, "a"), (2, 1, "b")).toDF("query_id", "rank", "doc_id")
    val qrels = Seq((1, "a", 1), (2, "x", 1)).toDF("query_id", "doc_id", "grade")
    val row = IrMetrics.pairedSignificance(run, run, qrels).collect().head
    assert(row.getDouble(3) == 0.0 && row.getDouble(4) == 0.0)
    assert(row.getLong(7) == 2)
  }
}
