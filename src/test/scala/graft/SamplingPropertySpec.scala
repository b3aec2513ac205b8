package graft

import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Property-style invariants of the two-phase rank operators, checked
  * on seeded-random inputs against single-machine references:
  *
  *  - stratifiedSampleExact over random strata/counts equals the
  *    window-rank reference, for any partitioning of the input
  *  - exactQuantiles / groupedQuantiles equal sorted-array selection
  *    for random value distributions (with ties) and random q sets
  *
  * Deterministic seeds; each case is a fresh random input, so these
  * are property tests in the ScalaCheck sense with a pinned generator.
  */
class SamplingPropertySpec extends SparkSpec {
  import spark.implicits._

  test("exact sampler equals the window reference on random inputs") {
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val nStrata = 2 + rnd.nextInt(4)
      val strata = (0 until nStrata).map(i => s"s$i")
      val rows = (0 until 2000 + rnd.nextInt(3000)).map { i =>
        (i.toLong, strata(rnd.nextInt(nStrata)))
      }
      val counts = strata.filter(_ => rnd.nextBoolean())
        .map(s => s -> (1L + rnd.nextInt(500))).toMap
      if (counts.nonEmpty) {
        val df = rows.toDF("doc_id", "g").repartition(1 + rnd.nextInt(8))
        val got = Sampling.stratifiedSampleExact(df, "g", "doc_id", counts)
          .select("doc_id").collect().map(_.getLong(0)).toSet
        val ref = rows.toDF("doc_id", "g")
          .filter(col("g").isin(counts.keySet.toSeq: _*))
          .withColumn("k", md5(concat(col("doc_id").cast("string"),
            lit(":42")).cast("binary")))
          .withColumn("rn", row_number().over(
            W.partitionBy("g").orderBy("k")))
          .filter(col("rn") <= counts.toSeq
            .foldLeft(lit(0L)) { case (acc, (s, k)) =>
              when(col("g") === s, lit(k)).otherwise(acc)
            })
          .select("doc_id").collect().map(_.getLong(0)).toSet
        assert(got == ref, s"seed=$seed counts=$counts")
      }
    }
  }

  test("temperature targets: sum within [total - |strata|, total] " +
      "before clamping, never exceed stratum sizes, deterministic") {
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(100 + seed)
      val nStrata = 2 + rnd.nextInt(4)
      val strata = (0 until nStrata).map(i => s"s$i")
      val rows = (0 until 1500 + rnd.nextInt(2500)).map { i =>
        (i.toLong, strata(rnd.nextInt(nStrata)))
      }
      val sizes = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val total = 50L + rnd.nextInt(800)
      val df = rows.toDF("doc_id", "g").repartition(1 + rnd.nextInt(8))
      val got = Sampling.temperatureResample(df, "g", "doc_id", total)
        .groupBy("g").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // per-stratum: k_s <= n_s and k_s equals the integer-share rule
      val roots = sizes.view.mapValues(n =>
        math.floor(math.sqrt(n.toDouble)).toLong).toMap
      val sumR = roots.values.sum
      strata.foreach { s =>
        val expect = math.min(sizes(s), total * roots(s) / sumR)
        assert(got.getOrElse(s, 0L) == expect,
          s"seed=$seed s=$s got=${got.get(s)} expect=$expect")
      }
      // unclamped floor-share sum loses at most one unit per stratum
      val unclamped = strata.map(s => total * roots(s) / sumR).sum
      assert(unclamped <= total && unclamped >= total - nStrata)
      // same seed twice -> identical kept set
      val again = Sampling.temperatureResample(df, "g", "doc_id", total)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val first = Sampling.temperatureResample(
          rows.toDF("doc_id", "g"), "g", "doc_id", total)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(again == first, s"seed=$seed")
    }
  }

  test("globalRank over a multi-column key is a bijection equal to " +
      "the sort order, for any partitioning") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(200 + seed)
      val rows = (0 until 3000 + rnd.nextInt(3000)).map { i =>
        (i.toLong, rnd.nextInt(50).toDouble, s"g${rnd.nextInt(3)}")
      }
      val df = rows.toDF("doc_id", "v", "g")
        .repartition(1 + rnd.nextInt(8))
      val got = Sampling.globalRank(df, Seq("v", "g", "doc_id"), "pos")
        .select("doc_id", "pos").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val ref = rows.sortBy { case (id, v, g) => (v, g, id) }
        .zipWithIndex.map { case ((id, _, _), i) => id -> i.toLong }.toMap
      assert(got == ref, s"seed=$seed")
    }
  }

  test("quantile selection equals the sorted array on random inputs") {
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      // duplicate-heavy: values drawn from a small integer range
      val vals = Seq.fill(1000 + rnd.nextInt(4000))(
        rnd.nextInt(50).toDouble)
      val qs = (Seq(0.0, 1.0) ++ Seq.fill(5)(rnd.nextDouble())).distinct
      val got = Sampling.exactQuantiles(
          vals.toDF("v").repartition(1 + rnd.nextInt(8)), "v", qs)
        .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
      val sorted = vals.sorted
      val want = qs.map(q =>
        q -> sorted(math.floor(q * (sorted.size - 1)).toInt)).toMap
      assert(got == want, s"seed=$seed")
    }
  }

  test("grouped quantiles equal per-group sorted arrays on random inputs") {
    for (seed <- 5 to 7) {
      val rnd = new scala.util.Random(seed)
      val nGroups = 2 + rnd.nextInt(5)
      val rows = Seq.fill(3000 + rnd.nextInt(3000))(
        (s"g${rnd.nextInt(nGroups)}", rnd.nextInt(200).toDouble))
      val qs = Seq(0.0, 1.0, rnd.nextDouble(), rnd.nextDouble()).distinct
      val got = Sampling.groupedQuantiles(
          rows.toDF("g", "v").repartition(1 + rnd.nextInt(8)), "g", "v", qs)
        .collect()
        .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
      val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
        val sorted = rs.map(_._2).sorted
        qs.map(q => (g, q) ->
          sorted(math.floor(q * (sorted.size - 1)).toInt))
      }
      assert(got == want, s"seed=$seed")
    }
  }
}
