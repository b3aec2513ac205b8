package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Sketch

/** Two-pass Misra–Gries exact heavy hitters: the verified output must
  * equal the brute-force GROUP BY + HAVING definition regardless of
  * partitioning, and the local MG summary must honor its survival
  * guarantee with bounded state. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def bruteForce(df: org.apache.spark.sql.DataFrame,
                         phi: Double) = {
    val toks = df.select(explode(TextFunctions.tokensCol(col("text"),
      removeStopwords = false)).as("tok"))
    val n = toks.count()
    toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= math.ceil(phi * n))
      .select(col("tok").as("token"), col("cnt"))
  }

  private val corpus = {
    // skewed vocabulary: "alpha" in every doc, "beta" in half, a long
    // unique tail — plus stopwords, which heavyHitters keeps by default
    val docs = (0 until 400).map { i =>
      val tail = s"uniq$i only once w$i"
      val beta = if (i % 2 == 0) "beta beta" else ""
      (i.toLong, s"alpha the $beta common word $tail")
    }
    docs.toDF("doc_id", "text")
  }

  test("exact result equals brute force, independent of partitioning") {
    val expect = bruteForce(corpus, 0.02).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(expect.nonEmpty && expect.contains("alpha"))
    for (p <- Seq(1, 7, 32)) {
      val got = Sketch.heavyHitters(corpus.repartition(p), "text", 0.02)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expect, s"p=$p: $got vs $expect")
    }
  }

  test("ordering is (cnt desc, token asc) and counts are exact") {
    val rows = Sketch.heavyHitters(corpus, "text", 0.02).collect()
    val asSeq = rows.map(r => (r.getLong(1), r.getString(0))).toSeq
    assert(asSeq == asSeq.sortBy { case (c, t) => (-c, t) })
    // "alpha" appears exactly once per doc
    assert(rows.find(_.getString(0) == "alpha").get.getLong(1) == 400L)
  }

  test("tight phi keeps only the universal token") {
    // tokens/doc ~ 8-10; alpha is ~1/9 of the stream; phi=0.09 keeps
    // only the always-present tokens
    val got = Sketch.heavyHitters(corpus, "text", 0.09)
      .collect().map(_.getString(0)).toSet
    val expect = bruteForce(corpus, 0.09)
      .collect().map(_.getString(0)).toSet
    assert(got == expect && got.contains("alpha") && !got.contains("uniq0"))
  }

  test("misraGries: bounded state and survival guarantee") {
    // stream: 'hot' has freq 40 of 100 (> n/(k+1) for k=4) and MUST
    // survive; state never exceeds k counters
    val stream = Seq.fill(40)("hot") ++ (0 until 60).map(i => s"cold$i")
    // adversarial order: interleave
    val inter = stream.zipWithIndex.sortBy(_._2 % 7).map(_._1)
    val (counters, n) = Sketch.misraGries(inter.iterator, 4)
    assert(n == 100L)
    assert(counters.size <= 4)
    assert(counters.contains("hot"))
  }

  test("HLL calibration: raw-branch accuracy within theory on a " +
      "high-cardinality stream, independent of partitioning") {
    val vals = (0 until 60000).map(i => s"value_$i").toDF("v")
    for (p <- Seq(1, 8)) {
      val row = Sketch.hllDistinctCalibration(vals.repartition(p), "v",
        b = 8).collect()(0)
      assert(row.getLong(0) == 60000L)
      // sigma = 1.04/sqrt(256) = 6.5%; 5 sigma = 32.5%
      assert(row.getDouble(2) < 0.325,
        s"p=$p rel_error=${row.getDouble(2)}")
      // raw branch: estimate must not be a linear-counting artifact
      assert(row.getDouble(1) > 640.0)
    }
  }

  test("HLL calibration: small cardinality takes the linear-counting " +
      "branch and lands very close") {
    val vals = (0 until 40).flatMap(i => Seq.fill(100)(s"tok$i"))
      .toDF("v")
    val row = Sketch.hllDistinctCalibration(vals, "v", b = 8).collect()(0)
    assert(row.getLong(0) == 40L)
    assert(row.getDouble(2) < 0.15, s"rel_error=${row.getDouble(2)}")
  }

  test("empty and null-text inputs yield an empty relation") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Sketch.heavyHitters(empty, "text", 0.1).collect().isEmpty)
    val nulls = Seq((1L, null: String)).toDF("doc_id", "text")
    assert(Sketch.heavyHitters(nulls, "text", 0.1).collect().isEmpty)
  }

  test("CMS never underestimates; an uncollided skewed head is exact; " +
      "ordering is (n_exact desc, token asc)") {
    // Zipf-ish: item i appears 200/i times — the head dwarfs the tail
    val vals = (1 to 60).flatMap(i => Seq.fill(200 / i)(s"item_$i"))
      .toDF("v")
    val rows = Sketch.cmsCalibration(vals, "v", d = 4, wBits = 8,
      probeK = 10).collect()
    assert(rows.length == 10)
    // the defining CMS guarantee: estimate >= exact, always
    rows.foreach { r =>
      assert(r.getLong(3) >= 0L,
        s"underestimate for ${r.getString(0)}: $r")
      assert(r.getLong(2) == r.getLong(1) + r.getLong(3))
    }
    // top probe is the head item with its exact count
    assert(rows.head.getString(0) == "item_1" && rows.head.getLong(1) == 200L)
    // sorted by exact desc then token asc
    val keys = rows.map(r => (-r.getLong(1), r.getString(0))).toSeq
    assert(keys == keys.sorted)
  }

  test("per-group HLL matches the global calibration per key and " +
      "audits each group against its exact count") {
    val vals = (for {
      g <- Seq("a", "b")
      i <- 1 to (if (g == "a") 40 else 300)
    } yield (g, s"$g$i")).toDF("k", "v")
    val rows = Sketch.hllDistinctByKey(vals, "k", "v", b = 8)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(rows.keySet == Set("a", "b"))
    assert(rows("a")._1 == 40L && rows("b")._1 == 300L)
    assert(rows("a")._3 < 0.15 && rows("b")._3 < 0.15,
      s"rel_error too high: $rows")
    // group-scoped registers must equal the single-key sketch run on
    // each group alone — the aggregate is truly per-key
    for (g <- Seq("a", "b")) {
      val solo = Sketch.hllDistinctCalibration(
        vals.filter(col("k") === g).select("v"), "v", b = 8)
        .collect()(0)
      assert(solo.getDouble(1) == rows(g)._2,
        s"group $g: solo=${solo.getDouble(1)} grouped=${rows(g)._2}")
    }
  }

  test("histogramQuantiles: estimates never undershoot the exact " +
      "quantile and the normalized error honors the 1/nBuckets bound; " +
      "a constant column degenerates cleanly") {
    val vals = (1 to 1000).map(i => Tuple1((i * i % 997).toLong))
      .toDF("x")
    val rows = Sketch.histogramQuantiles(vals, "x", nBuckets = 128,
        qs = Seq(0.1, 0.5, 0.9)).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (exact, est, err) =
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(est >= exact, s"undershoot at q=${r.getDouble(0)}: $r")
      assert(err >= 0.0 && err <= 1.0 / 128 + 1e-6,
        s"error above the bucket bound: $r")
    }
    val const = Seq.fill(50)(Tuple1(7L)).toDF("x")
    val c = Sketch.histogramQuantiles(const, "x", nBuckets = 16,
        qs = Seq(0.5)).collect()(0)
    assert(c.getDouble(1) == 7.0 && c.getDouble(2) == 7.0 &&
      c.getDouble(3) == 0.0, c.toString)
  }

  test("cmsTuned: the tuned probe table at the selected width equals " +
      "the direct sketch at that width (modulo folds are exact), " +
      "never underestimates, and the selection is from the grid") {
    // heavy skew: one token dominating + a tail, forcing collisions at
    // the narrow widths so the selection is non-trivial
    val vals = (Seq.fill(500)("hot") ++
      (1 to 200).flatMap(i => Seq.fill(3)(s"t$i"))).toDF("v")
    val tuned = Sketch.cmsTuned(vals, "v", d = 4,
      wBitsGrid = Seq(4, 6, 8), probeK = 10, relBound = 0.02)
      .collect()
    val wb = tuned.map(_.getInt(0)).distinct
    assert(wb.length == 1 && Seq(4, 6, 8).contains(wb.head), wb.toSeq)
    tuned.foreach(r => assert(r.getLong(3) >= r.getLong(2),
      s"underestimate: $r"))
    // fold exactness: the tuned table must equal cmsCalibration built
    // DIRECTLY at the selected width
    val direct = Sketch.cmsCalibration(vals, "v", d = 4,
        wBits = wb.head, probeK = 10)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    tuned.foreach { r =>
      assert(direct(r.getString(1)) == r.getLong(3),
        s"fold mismatch at ${r.getString(1)}")
    }
  }
}
