package graft

import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Sampling}
import graft.streaming.Sync

/** Exact-count stratified sampling, exact quantiles, bloom
  * decontamination, and streaming duplicate reports. (The fraction
  * form of stratified sampling is TextAnalysis.stratifiedSample,
  * covered by PipelineOpsSpec / the mixture_sample oracle.) */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) =
    spark.range(n).select(col("id").as("doc_id"),
      element_at(array(lit("a"), lit("b"), lit("c")),
        (col("id") % 3 + 1).cast("int")).as("stratum"))

  test("exact sample takes exactly k per stratum, clamped to size") {
    val df = corpus(3000) // ~1000 per stratum
    val got = Sampling.stratifiedSampleExact(df, "stratum", "doc_id",
      Map("a" -> 10L, "b" -> 2000L))
    val counts = got.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("a" -> 10L, "b" -> 1000L), s"$counts")
    // the kept set is the k smallest full-md5 keys per stratum — the
    // window-rank reference (fine at test scale; the operator exists
    // so production never runs this window)
    val ref = df.withColumn("k",
        md5(concat(col("doc_id").cast("string"), lit(":42")).cast("binary")))
      .withColumn("rn", row_number().over(
        W.partitionBy("stratum").orderBy("k")))
      .filter(col("rn") <= when(col("stratum") === "a", 10).otherwise(2000))
      .filter(col("stratum") =!= "c")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.select("doc_id").collect().map(_.getLong(0)).toSet == ref)
  }

  test("range sort width follows session parallelism, not a fixed cap") {
    val df = corpus(3000)
    // explicit width wins
    val wide = Sampling.stratifiedSampleExact(df, "stratum", "doc_id",
      Map("a" -> 10L), rangeParts = Some(48))
    assert(wide.rdd.getNumPartitions == 48)
    // default follows spark.sql.shuffle.partitions — a cluster session
    // at 2000 gets a 2000-task range sort, not the old min(32, …) cap
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "41")
      val d = Sampling.stratifiedSampleExact(df, "stratum", "doc_id",
        Map("a" -> 10L))
      assert(d.rdd.getNumPartitions == 41, s"${d.rdd.getNumPartitions}")
      val q = Sampling.groupedQuantiles(
        df.select(col("stratum"), col("doc_id").cast("double").as("v")),
        "stratum", "v", Seq(0.5))
      // grouped quantiles' output rows come from the ranged relation's
      // partitions; assert on the pre-orderBy width via a fresh call
      assert(q.collect().length == 3)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("stratified sampler rejects a non-string stratum column up front") {
    val df = spark.range(10).select(col("id").as("doc_id"),
      (col("id") % 3).as("stratum")) // LongType stratum
    val ex = intercept[IllegalArgumentException] {
      Sampling.stratifiedSampleExact(df, "stratum", "doc_id", Map("0" -> 2L))
    }
    assert(ex.getMessage.contains("must be StringType"))
  }

  test("deterministic shuffle: positions are a permutation equal to " +
      "the rank reference, partitioning-independent, seed-independent") {
    val df = corpus(50000)
    val got = Sampling.deterministicShuffle(df, "doc_id", seed = 7L)
      .select("doc_id", "position").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // bijection onto 0..N−1
    assert(got.size == 50000 && got.values.toSet == (0L until 50000L).toSet)
    // equals the global window-rank reference (fine at test scale;
    // the operator exists so production never runs this window)
    val ref = df.withColumn("k",
        md5(concat(col("doc_id").cast("string"), lit(":7")).cast("binary")))
      .withColumn("position", row_number().over(W.orderBy("k")) - 1)
      .select("doc_id", "position").collect()
      .map(r => r.getLong(0) -> (r.getInt(1).toLong)).toMap
    assert(got == ref)
    // partitioning-independent: a skewed repartition yields the same map
    val skewed = Sampling.deterministicShuffle(
        df.repartition(3, col("stratum")), "doc_id", seed = 7L)
      .select("doc_id", "position").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(skewed == got)
    // a different seed is a genuinely different permutation
    val other = Sampling.deterministicShuffle(df, "doc_id", seed = 8L)
      .select("doc_id", "position").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(other.values.toSet == (0L until 50000L).toSet)
    assert(other != got)
  }

  test("groupedRank equals the per-group window rank, " +
      "partitioning-independent") {
    val df = corpus(30000).withColumn("k",
      md5(concat(col("doc_id").cast("string"), lit(":g")).cast("binary")))
    val got = Sampling.groupedRank(df, "stratum", "k", "rnk")
      .select("doc_id", "rnk").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = df.withColumn("rnk",
        row_number().over(W.partitionBy("stratum").orderBy("k")) - 1)
      .select("doc_id", "rnk").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(got == ref)
    // a skewed input partitioning yields the same ranks
    val skewed = Sampling.groupedRank(
        df.repartition(3, col("stratum")), "stratum", "k", "rnk")
      .select("doc_id", "rnk").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(skewed == got)
  }

  test("groupedRank spreads a dominant group across range partitions " +
      "(the shape a partition-by window cannot have) and stays exact") {
    // 95% of rows in one group — the whole-group-window killer
    val df = spark.range(40000).select(col("id").as("doc_id"),
        when(col("id") % 20 =!= 0, "hot").otherwise(
          concat(lit("cold"), (col("id") % 5).cast("string"))).as("g"))
      .withColumn("k", md5(col("doc_id").cast("string").cast("binary")))
    val ranked = Sampling.groupedRank(df, "g", "k", "rnk",
      rangeParts = Some(16))
    // exactness under dominance
    val hot = ranked.filter(col("g") === "hot")
    val n = hot.count()
    assert(n == 38000)
    val ranks = hot.select("rnk").collect().map(_.getLong(0)).toSet
    assert(ranks == (0L until n).toSet)
    // the hot group's rows really occupy MANY partitions of the
    // range-partitioned relation (replay the same partitioning)
    val spread = df.repartitionByRange(16, col("g"), col("k"))
      .filter(col("g") === "hot")
      .select(spark_partition_id().as("pid"))
      .distinct().count()
    assert(spread > 8, s"hot group occupies only $spread partitions")
  }

  test("temperature resample flattens by integer-exact sqrt shares " +
      "and clamps to stratum size") {
    // strata sizes 1000/100/10 -> s = 31/10/3, S = 44
    val df = spark.range(1110).select(col("id").as("doc_id"),
      when(col("id") < 1000, "a").when(col("id") < 1100, "b")
        .otherwise("c").as("stratum"))
    val counts = Sampling.temperatureResample(df, "stratum", "doc_id",
        total = 100L, seed = 7L)
      .groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // k = floor(100 * s / 44): a 70, b 22, c 6 — the tail is upweighted
    // (raw shares 90/9/1 percent -> 70/22/6)
    assert(counts == Map("a" -> 70L, "b" -> 22L, "c" -> 6L), s"$counts")
    // a huge budget clamps every stratum to its size
    val all = Sampling.temperatureResample(df, "stratum", "doc_id",
        total = 100000L, seed = 7L)
      .groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(all == Map("a" -> 1000L, "b" -> 100L, "c" -> 10L), s"$all")
    // the kept set IS the exact-sampler set for the derived targets
    val viaExact = Sampling.stratifiedSampleExact(df, "stratum",
        "doc_id", Map("a" -> 70L, "b" -> 22L, "c" -> 6L), seed = 7L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val viaTemp = Sampling.temperatureResample(df, "stratum", "doc_id",
        total = 100L, seed = 7L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaTemp == viaExact)
  }

  test("exact quantiles equal sorted-array selection") {
    val vals = Seq(5.0, 1.0, 9.0, 1.0, 7.0, 3.0, 3.0, 8.0, 2.0, 6.0, 4.0)
    val df = vals.toDF("v")
    val qs = Seq(0.0, 0.1, 0.5, 0.9, 1.0)
    val got = Sampling.exactQuantiles(df, "v", qs).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val sorted = vals.sorted
    val want = qs.map(q =>
      q -> sorted(math.floor(q * (sorted.size - 1)).toInt)).toMap
    assert(got == want, s"got $got want $want")
  }

  test("exact quantiles: duplicate-heavy column and single row") {
    val df = (Seq.fill(50)(2.0) ++ Seq.fill(50)(7.0)).toDF("v")
    val got = Sampling.exactQuantiles(df, "v", Seq(0.25, 0.75)).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(got == Map(0.25 -> 2.0, 0.75 -> 7.0))
    val one = Sampling.exactQuantiles(Seq(3.5).toDF("v"), "v",
      Seq(0.0, 0.5, 1.0)).collect().map(_.getDouble(1)).toSeq
    assert(one == Seq(3.5, 3.5, 3.5))
  }

  test("exact sampler at 300k rows: exact counts, run-to-run identical") {
    val df = corpus(300000)
    val spec = Map("a" -> 1000L, "b" -> 1000L)
    val r1 = Sampling.stratifiedSampleExact(df, "stratum", "doc_id", spec)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(r1.size == 2000)
    val r2 = Sampling.stratifiedSampleExact(df.repartition(13), "stratum",
      "doc_id", spec).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(r1 == r2, "exact sample must not depend on input partitioning")
  }

  test("weighted sampler at 200k rows: exact counts, partitioning-" +
      "independent, matches the window reference") {
    val df = spark.range(200000).select(col("id").as("doc_id"),
      element_at(array(lit("a"), lit("b")),
        (col("id") % 2 + 1).cast("int")).as("stratum"),
      ((col("id") % 97) + 1).cast("double").as("w"))
    val spec = Map("a" -> 500L, "b" -> 500L)
    val r1 = Sampling.weightedSampleExact(df, "stratum", "doc_id", "w",
      spec).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(r1.size == 1000)
    val r2 = Sampling.weightedSampleExact(df.repartition(13), "stratum",
      "doc_id", "w", spec)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(r1 == r2, "weighted sample must not depend on partitioning")
    val key = -log(conv(substring(
        md5(concat(col("doc_id").cast("string"), lit(":42")).cast("binary")),
        1, 8), 16, 10).cast("double") / lit(4294967296.0)) / col("w")
    val ref = df.withColumn("rn", row_number().over(
        W.partitionBy("stratum")
          .orderBy(key, col("doc_id").cast("string"))))
      .filter(col("rn") <= 500)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(r1 == ref)
  }

  test("exact quantiles at 200k rows match the sorted array") {
    val df = spark.range(200000)
      .select(((col("id") * 2654435761L) % 1000003).cast("double").as("v"))
    val qs = Seq(0.001, 0.25, 0.5, 0.75, 0.999)
    val got = Sampling.exactQuantiles(df, "v", qs).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val sorted = df.collect().map(_.getDouble(0)).sorted
    val want = qs.map(q =>
      q -> sorted(math.floor(q * (sorted.length - 1)).toInt)).toMap
    assert(got == want, s"got $got want $want")
  }

  test("grouped quantiles equal per-group sorted-array selection") {
    val data = Seq(("a", 5.0), ("a", 1.0), ("a", 9.0), ("a", 3.0),
      ("b", 10.0), ("b", 20.0), ("b", 30.0), ("b", 40.0), ("b", 50.0),
      ("c", 7.0))
    val df = data.toDF("g", "v")
    val qs = Seq(0.0, 0.5, 1.0)
    val got = Sampling.groupedQuantiles(df, "g", "v", qs).collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val want = data.groupBy(_._1).flatMap { case (g, rows) =>
      val sorted = rows.map(_._2).sorted
      qs.map(q => (g, q) ->
        sorted(math.floor(q * (sorted.size - 1)).toInt))
    }
    assert(got == want, s"got $got want $want")
  }

  test("grouped quantiles at 150k rows, 3 groups, straddling " +
      "partition boundaries") {
    val df = spark.range(150000).select(
      element_at(array(lit("x"), lit("y"), lit("z")),
        (col("id") % 3 + 1).cast("int")).as("g"),
      ((col("id") * 48271L) % 99991L).cast("double").as("v"))
    val qs = Seq(0.25, 0.75)
    val got = Sampling.groupedQuantiles(df, "g", "v", qs).collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val want = df.collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).flatMap { case (g, rows) =>
        val sorted = rows.map(_._2).sorted
        qs.map(q => (g, q) ->
          sorted(math.floor(q * (sorted.length - 1)).toInt))
      }
    assert(got == want)
  }

  test("bloom decontamination equals the exact broadcast form") {
    // a 5-gram can only match across docs via the %7 shared phrase:
    // every other doc is 8 tokens with its unique id at position 4,
    // so EVERY 5-token window of a unique doc contains the id
    val docs = spark.range(200).select(col("id").as("doc_id"),
      when(col("id") % 7 === 0,
        lit("the shared phrase of five tokens appears verbatim here"))
        .otherwise(concat(lit("one two three d"), col("id"),
          lit(" four five six seven"))).as("text"))
    val evalSet = docs.filter(col("doc_id") % 10 === 0)
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val exact = Dedup.decontaminateRows(train, "doc_id", "text",
      evalSet, "doc_id", "text", n = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val bloom = Dedup.decontaminateBloom(train, "doc_id", "text",
      evalSet, "doc_id", "text", n = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(bloom == exact)
    assert(exact.nonEmpty && exact.size < 180,
      s"fixture must have both kept and dropped docs: ${exact.size}")
  }

  test("weighted sampler equals the window reference, honors counts, " +
      "and draws proportional to weight") {
    // two strata; in 'a', doc_ids < 50 carry weight 50, the rest 1
    val df = spark.range(1000).select(col("id").as("doc_id"),
      when(col("id") % 2 === 0, "a").otherwise("b").as("stratum"),
      when(col("id") < 50, 50.0).otherwise(1.0).as("w"))
    val got = Sampling.weightedSampleExact(df, "stratum", "doc_id", "w",
      Map("a" -> 20L, "b" -> 10L))
    val counts = got.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("a" -> 20L, "b" -> 10L), s"$counts")
    // window reference with the identical key arithmetic
    val key = -log(conv(substring(
        md5(concat(col("doc_id").cast("string"), lit(":42")).cast("binary")),
        1, 8), 16, 10).cast("double") / lit(4294967296.0)) / col("w")
    val ref = df.withColumn("rn", row_number().over(
        W.partitionBy("stratum")
          .orderBy(key, col("doc_id").cast("string"))))
      .filter(col("rn") <= when(col("stratum") === "a", 20).otherwise(10))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.select("doc_id").collect().map(_.getLong(0)).toSet == ref)
    // weight-proportionality: the 25 weight-50 rows in 'a' hold ~66% of
    // stratum mass — they must dominate the 20-row draw
    val heavy = got.filter(col("stratum") === "a" && col("doc_id") < 50)
      .count()
    assert(heavy >= 10, s"only $heavy heavy rows drawn")
    // zero/negative weights never sample
    val z = Sampling.weightedSampleExact(
      df.withColumn("w", when(col("doc_id") < 990, 0.0).otherwise(-1.0)),
      "stratum", "doc_id", "w", Map("a" -> 5L))
    assert(z.count() == 0)
  }

  test("fuzzy decontamination drops near-dups of eval docs and ONLY " +
      "those; bucket collision alone never drops") {
    // three text families: (a) near-identical long docs differing in
    // one token — near-dups across the train/eval split; (b) unique
    // docs sharing no shingles with anything; eval holds one (a) doc
    val base = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = Seq(
      (10L, base + " end0"),          // eval (10 % 10 == 0)
      (11L, base + " end1"),          // train near-dup of 10 -> dropped
      (12L, base + " end2"),          // train near-dup of 10 -> dropped
      (13L, "totally different words about completely other things " +
        "written in another register with no overlap whatsoever"),
      (20L, "second eval doc that matches nothing in the train side")
    ).toDF("doc_id", "text")
    val evalSet = docs.filter(col("doc_id") % 10 === 0)
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val kept = Dedup.decontaminateFuzzy(train, "doc_id", "text",
        evalSet, "doc_id", "text", n = 3, numHashes = 16, bands = 8,
        threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(13L), s"$kept")
    // a sky-high threshold keeps everything: banding may collide, but
    // the Jaccard verify gates the drop
    val keptAll = Dedup.decontaminateFuzzy(train, "doc_id", "text",
        evalSet, "doc_id", "text", n = 3, numHashes = 16, bands = 8,
        threshold = 0.999)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptAll === Set(11L, 12L, 13L), s"$keptAll")
  }

  test("streaming dup reports: in-batch and cross-batch duplicates " +
      "resolve to the numeric-min original") {
    val dir = java.nio.file.Files.createTempDirectory("sdup").toString + "/in"
    val ck = java.nio.file.Files.createTempDirectory("sdupck").toString + "/ck"
    // batch 1: ids 1-4 with an IN-batch dup pair (2,4); batch 2: ids
    // 5-7 where 5 and 7 duplicate batch-1 content (cross-batch)
    val b1 = Seq((1L, "aa"), (2L, "bb"), (3L, "cc"), (4L, "bb"))
      .toDF("doc_id", "text")
    val b2 = Seq((5L, "aa"), (6L, "dd"), (7L, "bb")).toDF("doc_id", "text")
    b1.coalesce(1).write.parquet(dir)
    // mtime ordering: the second file must sort after the first
    val first = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
    try first.forEach(p =>
      java.nio.file.Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(1600000000000L)))
    finally first.close()
    b2.coalesce(1).write.mode("append").parquet(dir)
    val stream = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = Sync.streamingDupReports(stream, "doc_id", "text")
      .writeStream.outputMode("append").format("memory")
      .queryName("dupreports").option("checkpointLocation", ck).start()
    q.processAllAvailable(); q.stop()
    val got = spark.sql("SELECT doc_id, first_doc_id FROM dupreports")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(got == Set(4L -> 2L, 5L -> 1L, 7L -> 2L), s"$got")
    // bounded (one-pass) mode emits the same set
    val batch = Sync.streamingDupReports(b1.unionByName(b2),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(batch == got)
  }

  test("TTL dup reports: chain rule over event time, and state EVICTS " +
      "once the watermark passes canonical_ts + horizon") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val dir = java.nio.file.Files.createTempDirectory("sdupt").toString + "/in"
    val ck = java.nio.file.Files.createTempDirectory("sduptck").toString + "/ck"
    // 'aa' copies at t=10, 30 (gap 20 ≤ 50 → dup of 1), 100 (gap 90
    // from canonical 1 → NEW canonical, no report), 120 (gap 20 from
    // canonical 8 → dup of 8); five one-off texts whose state must
    // not outlive the horizon
    val b1 = Seq((1L, "aa", ts(10)), (2L, "bb", ts(11)), (3L, "cc", ts(12)),
      (4L, "dd", ts(13)), (5L, "ee", ts(14))).toDF("doc_id", "text", "ets")
    val b2 = Seq((6L, "aa", ts(30)), (7L, "ff", ts(35)))
      .toDF("doc_id", "text", "ets")
    val b3 = Seq((8L, "aa", ts(100)), (9L, "aa", ts(120)),
      (10L, "gg", ts(1000))).toDF("doc_id", "text", "ets")
    var stamp = 1600000000000L
    val stamped = scala.collection.mutable.Set.empty[java.nio.file.Path]
    Seq(b1, b2, b3).foreach { b =>
      b.coalesce(1).write.mode("append").parquet(dir)
      val ls = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      try ls.forEach { p =>
        if (p.getFileName.toString.endsWith(".parquet") &&
            !stamped.contains(p)) {
          java.nio.file.Files.setLastModifiedTime(p,
            java.nio.file.attribute.FileTime.fromMillis(stamp))
          stamped += p
        }
      } finally ls.close()
      stamp += 60000
    }
    val stream = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
      .withWatermark("ets", "5 seconds")
    val q = Sync.streamingDupReportsTtl(stream, "doc_id", "text", "ets",
        horizonUs = 50L * 1000000L)
      .writeStream.outputMode("append").format("memory")
      .queryName("dupttl").option("checkpointLocation", ck).start()
    q.processAllAvailable(); q.stop()
    val got = spark.sql("SELECT doc_id, first_doc_id FROM dupttl")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(got == Set(6L -> 1L, 9L -> 8L), s"$got")
    // eviction: the final watermark (1000 − 5 = 995 s) is past every
    // canonical's ts + 50 s except gg's — exactly ONE state row may
    // survive, not the 7 distinct hashes seen
    val lastState = q.recentProgress.reverse
      .find(_.stateOperators.nonEmpty).get.stateOperators(0)
    assert(lastState.numRowsTotal == 1L,
      s"state rows: ${lastState.numRowsTotal}")
  }

  test("dup reports under a DISORDERED feed retro-report the " +
      "displaced canonical — the dup set stays exact") {
    // id 1 arrives AFTER id 5 with the same content: 5 was retained,
    // so the displacement must emit (5 -> 1) rather than silently
    // forgetting 5 ever existed
    val dir = java.nio.file.Files.createTempDirectory("sdupo").toString + "/in"
    val ck = java.nio.file.Files.createTempDirectory("sdupock").toString + "/ck"
    val b1 = Seq((5L, "aa"), (6L, "bb")).toDF("doc_id", "text")
    val b2 = Seq((1L, "aa")).toDF("doc_id", "text")
    b1.coalesce(1).write.parquet(dir)
    val first = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
    try first.forEach(p =>
      java.nio.file.Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(1600000000000L)))
    finally first.close()
    b2.coalesce(1).write.mode("append").parquet(dir)
    val stream = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = Sync.streamingDupReports(stream, "doc_id", "text")
      .writeStream.outputMode("append").format("memory")
      .queryName("dupdisord").option("checkpointLocation", ck).start()
    q.processAllAvailable(); q.stop()
    val got = spark.sql("SELECT doc_id, first_doc_id FROM dupdisord")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(got == Set(5L -> 1L), s"$got")
  }
}
