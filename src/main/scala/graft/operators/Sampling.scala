package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Deterministic corpus sampling for training-data mixture
  * construction: EXACT per-stratum counts (distributed rank) and exact
  * distributed quantiles (rank selection without a global
  * single-partition sort). The FRACTION form of stratified sampling —
  * map-only Bernoulli keep-rates per stratum — already lives in
  * [[TextAnalysis.stratifiedSample]] (query `mixture_sample`); this
  * object adds the shapes a rate filter cannot express.
  *
  * Reference anchor: the reference samples benchmark datasets and
  * splits by fraction driver-side (pandas `.sample`); at corpus scale
  * sampling must be a distributed, RESTARTABLE decision — the same row
  * always lands on the same side of the cut — so every operator here
  * derives its randomness from a cross-engine-replayable hash, never
  * from an RNG stream whose draw order depends on partitioning.
  *
  * The order key is md5 over `"<id>:<seed>"` (lowercase hex in both
  * Spark and DuckDB), compared lexicographically — string order equals
  * numeric order for fixed-width lowercase hex, so a DuckDB oracle
  * replays the exact surviving set with no bigint conversion.
  */
object Sampling {

  /** The deterministic per-row order key: md5("<id>:<seed>"),
    * lowercase hex — FULL 128-bit digest, because the exact sampler
    * sorts by it and a truncated-prefix tie would make the rank-k cut
    * engine-dependent. md5 (not sha2) keeps the oracle replay a
    * one-call builtin on both engines. */
  private def hashHex(idCol: String, seed: Long) =
    md5(concat(col(idCol).cast("string"), lit(":" + seed)).cast("binary"))

  /** EXACT per-stratum sample counts via the two-phase distributed
    * rank (the [[Bm25.sparseVectors]] idiom, per stratum): range-
    * partition by (stratum, hash-key), count each (partition, stratum)
    * slice — a bounded P×|strata| relation collected to the driver —
    * then take each partition's prefix of every stratum locally. No
    * whole-stratum window: a `row_number() OVER (PARTITION BY
    * stratum)` would pull each stratum into ONE task, which is exactly
    * the skew this shape avoids (a web-scale stratum is most of the
    * corpus). The output is the k_s smallest hash keys per stratum —
    * a deterministic, engine-independent set.
    *
    * Strata absent from `counts` are dropped; a stratum with fewer
    * rows than requested yields all of them.
    *
    * `rangeParts` widths the ONE corpus-wide range sort; the default
    * follows the session's shuffle parallelism (so a 2000-partition
    * cluster session range-sorts through 2000 tasks, not a fixed
    * local-harness cap). The driver-side slice collect stays bounded
    * by parts×|strata| either way — at 2000 partitions × 100 strata
    * that is 200k tiny rows, still driver-trivial. */
  def stratifiedSampleExact(df: DataFrame, strataCol: String,
      idCol: String, counts: Map[String, Long],
      seed: Long = 42L, rangeParts: Option[Int] = None): DataFrame = {
    require(counts.nonEmpty, "empty count spec")
    val spark = df.sparkSession
    require(df.schema(strataCol).dataType ==
        org.apache.spark.sql.types.StringType,
      s"stratum column '$strataCol' must be StringType (got " +
        s"${df.schema(strataCol).dataType.simpleString}); cast it — the " +
        "count spec keys and the per-partition take compare on strings")
    val parts = math.max(1, rangeParts.getOrElse(
      spark.sessionState.conf.numShufflePartitions))
    rankPrefixTake(
      df.withColumn("_okey", hashHex(idCol, seed)),
      strataCol, counts, parts)
  }

  /** Shared two-phase rank-prefix core: for a relation already carrying
    * an `_okey` order column, take each stratum's k_s SMALLEST keys —
    * one range sort on (stratum, _okey), a bounded P×|strata| slice
    * collect, per-partition prefix take. Used by the hash-keyed
    * uniform sampler and the Efraimidis–Spirakis weighted sampler. */
  private def rankPrefixTake(withKey: DataFrame, strataCol: String,
      counts: Map[String, Long], parts: Int): DataFrame = {
    val spark = withKey.sparkSession
    val wanted = counts.keySet
    // localCheckpoint: TWO consumers (slice counts + the final take)
    // must see the SAME sampled range boundaries — see the
    // repartitionByRange gotcha pinned in Bm25.sparseVectors.
    // Lifetime: the returned relation READS these checkpoint blocks,
    // so they cannot be released here; the caller owns cache lifetime
    // (materialize the result, then let the relation go out of scope —
    // blocks free with the RDD's GC-driven cleanup)
    val ranged = withKey
      .filter(col(strataCol).isin(wanted.toSeq: _*))
      .repartitionByRange(parts, col(strataCol), col("_okey"))
      .sortWithinPartitions(col(strataCol), col("_okey"))
      .localCheckpoint()
    val slice = ranged
      .groupBy(spark_partition_id().as("pid"), col(strataCol).as("s"))
      .agg(count(lit(1)).as("c"))
      .collect() // bounded: partitions × |strata|, never corpus rows
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .sortBy(r => (r._2, r._1))
    // take(pid, s) = clamp(k_s − rows of s in earlier partitions)
    val takeMap = scala.collection.mutable.Map.empty[(Int, String), Long]
    var curS = ""
    var before = 0L
    slice.foreach { case (pid, s, c) =>
      if (s != curS) { curS = s; before = 0L }
      val k = counts.getOrElse(s, 0L)
      val t = math.max(0L, math.min(c, k - before))
      if (t > 0) takeMap((pid, s)) = t
      before += c
    }
    val takeB = spark.sparkContext.broadcast(takeMap.toMap)
    val strataIdx = ranged.schema.fieldIndex(strataCol)
    val taken = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      // rows arrive sorted by (stratum, _okey), so "first t of the
      // stratum in encounter order" IS the rank prefix
      val remaining = scala.collection.mutable.Map.empty[String, Long]
      it.filter { row =>
        val s = row.getString(strataIdx)
        val left = remaining.getOrElseUpdate(s,
          takeB.value.getOrElse((pid, s), 0L))
        if (left > 0) { remaining(s) = left - 1; true } else false
      }
    }
    spark.createDataFrame(taken, ranged.schema).drop("_okey")
  }

  /** EXACT weighted sampling WITHOUT replacement, per stratum —
    * Efraimidis–Spirakis A-Res (2006) on the [[rankPrefixTake]]
    * machinery: each row draws a deterministic uniform u from
    * md5("<id>:<seed>") (first 8 hex chars as uint32 / 2³²) and is
    * ranked by the reservoir key −ln(u)/w ASCENDING (equivalent to
    * u^(1/w) descending) — the k_s smallest keys per stratum are
    * EXACTLY a weight-proportional without-replacement draw. Same
    * scale shape as [[stratifiedSampleExact]]: one range sort, a
    * bounded slice collect, no whole-stratum window; restartable (the
    * same row always draws the same u) and replayable cross-engine
    * (the key is two libm calls on identically-constructed doubles —
    * order flips need keys within ~1 ulp, vanishing for hash-derived
    * uniforms; id breaks exact ties in the sort key).
    *
    * Rows with weight <= 0 or NULL never sample (dropped up front,
    * the A-Res domain contract). u = 0 (probability 2⁻³² per row)
    * yields key = +∞: legal, sorts last. */
  def weightedSampleExact(df: DataFrame, strataCol: String,
      idCol: String, weightCol: String, counts: Map[String, Long],
      seed: Long = 42L, rangeParts: Option[Int] = None): DataFrame = {
    require(counts.nonEmpty, "empty count spec")
    val spark = df.sparkSession
    require(df.schema(strataCol).dataType ==
        org.apache.spark.sql.types.StringType,
      s"stratum column '$strataCol' must be StringType (got " +
        s"${df.schema(strataCol).dataType.simpleString}); cast it")
    val parts = math.max(1, rangeParts.getOrElse(
      spark.sessionState.conf.numShufflePartitions))
    // the id rides inside the (orderable) struct key so a boundary-rank
    // md5-prefix collision still selects the same row on every engine
    rankPrefixTake(
      df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
        .withColumn("_okey", struct(
          (-log(uniformFromId(idCol, seed)) /
            col(weightCol).cast("double")).as("k"),
          col(idCol).cast("string").as("i"))),
      strataCol, counts, parts)
  }

  /** Deterministic uniform in [0, 1): first 8 hex chars of
    * md5("<id>:<seed>") as uint32 / 2³² — one codegen'd parse, same
    * construction the oracle replays with `::UBIGINT`. */
  private def uniformFromId(idCol: String, seed: Long) =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.HexSliceToLong(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(
          hashHex(idCol, seed)), 0)).cast("double") / lit(4294967296.0)

  /** Deterministic GLOBAL training-order shuffle: every row gets a
    * stable position 0..N−1 in a pseudo-random permutation keyed by
    * md5("<id>:<seed>") — reshuffling a 100 TB corpus for each epoch
    * (different seed → independent order) with bit-reproducible
    * results across runs, partitionings, and engines.
    *
    * Position assignment is the relational zipWithIndex
    * ([[graft.operators.Bm25.sparseVectors]] idiom): range-partition
    * by the hash key, take each row's within-partition offset from
    * `monotonically_increasing_id` (pid in the high bits — each
    * partition ranks locally, never the corpus), then add broadcast
    * per-partition prefix offsets (the prefix-sum window runs over the
    * P-row COUNTS relation — P = range partitions, never corpus rows).
    * NO corpus-sized single-partition window. The full 128-bit key makes
    * cross-engine order ties impossible in practice; the range sort
    * width follows session parallelism. */
  def deterministicShuffle(df: DataFrame, idCol: String,
      seed: Long = 42L, rangeParts: Option[Int] = None): DataFrame =
    globalRank(df.withColumn("_okey", hashHex(idCol, seed)),
        Seq("_okey"), rangeParts = rangeParts)
      .drop("_okey")

  /** The deterministic order key as a public column, for callers
    * composing their own rank/schedule shapes (md5("<id>:<seed>"),
    * lowercase hex — the construction every oracle replays). */
  def orderKey(idCol: String, seed: Long): org.apache.spark.sql.Column =
    hashHex(idCol, seed)

  /** GLOBAL dense rank 0..N−1 over an arbitrary sort key — the
    * relational zipWithIndex core of [[deterministicShuffle]],
    * generalized to multi-column keys: range-partition by `keys`,
    * take each row's within-partition offset from
    * `monotonically_increasing_id` (pid in the high bits — each
    * partition ranks locally, never the corpus), then add broadcast
    * per-partition prefix offsets (the prefix-sum window runs over
    * the P-row COUNTS relation, never corpus rows). Caller owns key
    * uniqueness: ties across rows make the rank partitioning-
    * dependent, so include a unique tie-break column. */
  def globalRank(df: DataFrame, keys: Seq[String],
      outCol: String = "position",
      rangeParts: Option[Int] = None): DataFrame = {
    require(keys.nonEmpty, "globalRank needs at least one key column")
    val spark = df.sparkSession
    import org.apache.spark.sql.expressions.Window
    val parts = math.max(1, rangeParts.getOrElse(
      spark.sessionState.conf.numShufflePartitions))
    val kcols = keys.map(col)
    // localCheckpoint: offsets + the position join must read the SAME
    // sampled range boundaries (the repartitionByRange gotcha)
    val ranged = df
      .repartitionByRange(parts, kcols: _*)
      .sortWithinPartitions(kcols: _*)
      .withColumn("_mid", monotonically_increasing_id())
      .withColumn("_pid", shiftright(col("_mid"), 33).cast("int"))
      .withColumn("_lr", col("_mid").bitwiseAND(lit((1L << 33) - 1)))
      .localCheckpoint()
    val offs = ranged.groupBy("_pid").agg(count(lit(1)).as("c"))
      .withColumn("_off",
        coalesce(sum("c").over(Window.orderBy("_pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_pid", "_off")
    ranged.join(broadcast(offs), "_pid")
      .withColumn(outCol, col("_lr") + col("_off"))
      .drop("_mid", "_pid", "_lr")
  }

  /** PER-GROUP dense rank 0..N_g−1 — the scale-safe replacement for
    * `row_number() OVER (PARTITION BY group ORDER BY key)`, which
    * pulls every group into ONE task (a web-scale group is most of
    * the corpus). Same two-phase discipline as [[rankPrefixTake]]:
    * one range sort on (group, key), a bounded P×|groups| slice-count
    * collect, then each partition assigns `offset + running index`
    * per group in encounter order (rows arrive sorted by (group,
    * key), so the running index IS the within-partition rank).
    * Caller owns key uniqueness within a group (include a tie-break
    * column, else the rank is partitioning-dependent). `groupCol`
    * must be StringType, like the samplers. */
  def groupedRank(df: DataFrame, groupCol: String, keyCol: String,
      outCol: String = "group_rank",
      rangeParts: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    require(df.schema(groupCol).dataType ==
        org.apache.spark.sql.types.StringType,
      s"group column '$groupCol' must be StringType (got " +
        s"${df.schema(groupCol).dataType.simpleString}); cast it")
    val parts = math.max(1, rangeParts.getOrElse(
      spark.sessionState.conf.numShufflePartitions))
    val ranged = df
      .repartitionByRange(parts, col(groupCol), col(keyCol))
      .sortWithinPartitions(groupCol, keyCol)
      .localCheckpoint() // two consumers — the repartitionByRange gotcha
    val slice = ranged
      .groupBy(spark_partition_id().as("pid"), col(groupCol).as("g"))
      .agg(count(lit(1)).as("c"))
      .collect() // bounded: partitions × |groups|
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .sortBy(r => (r._2, r._1))
    // offset(pid, g) = rows of g in earlier partitions
    val offMap = scala.collection.mutable.Map.empty[(Int, String), Long]
    var curG = ""
    var before = 0L
    slice.foreach { case (pid, g, c) =>
      if (g != curG) { curG = g; before = 0L }
      if (before > 0) offMap((pid, g)) = before
      before += c
    }
    val offB = spark.sparkContext.broadcast(offMap.toMap)
    val gIdx = ranged.schema.fieldIndex(groupCol)
    val outRows = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      var curG: String = null
      var off = 0L
      var i = 0L
      it.map { row =>
        val g = row.getString(gIdx)
        if (g != curG) {
          curG = g
          off = offB.value.getOrElse((pid, g), 0L)
          i = 0L
        }
        val r = Row.fromSeq(row.toSeq :+ (off + i))
        i += 1
        r
      }
    }
    spark.createDataFrame(outRows, org.apache.spark.sql.types.StructType(
      ranged.schema.fields :+ org.apache.spark.sql.types.StructField(
        outCol, org.apache.spark.sql.types.LongType, nullable = false)))
  }

  /** Temperature-flattened mixture resampling — the multilingual
    * rebalancing rule of mT5/XLM-R (sample languages ∝ p_l^α, α<1
    * upweights the tail) materialized as EXACT per-stratum counts on
    * [[stratifiedSampleExact]]. α is fixed at 0.5 and the share
    * computation is INTEGER-exact by construction: s_l =
    * ⌊√n_l⌋ (IEEE sqrt is correctly rounded, so the floor is
    * engine-deterministic), k_l = min(n_l, ⌊total·s_l/Σs⌋) in integer
    * arithmetic (BigInt product — total·s_l overflows a long at
    * total ≈ 10¹² × s_l ≈ 10⁶) — no float share ever crosses an
    * engine boundary, so a DuckDB oracle replays k_l bit-exactly.
    *
    * Scale shape: one bounded |strata|-row count collect to derive
    * k_l, then the [[stratifiedSampleExact]] two-phase rank (one
    * range sort, bounded slice collect, no whole-stratum window). */
  def temperatureResample(df: DataFrame, strataCol: String,
      idCol: String, total: Long, seed: Long = 42L,
      rangeParts: Option[Int] = None): DataFrame = {
    require(total >= 1L, s"total must be positive: $total")
    require(df.schema(strataCol).dataType ==
        org.apache.spark.sql.types.StringType,
      s"stratum column '$strataCol' must be StringType (got " +
        s"${df.schema(strataCol).dataType.simpleString}); cast it")
    val counts = df.groupBy(strataCol).count()
      .collect() // bounded by |strata|
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "empty corpus")
    val roots = counts.map { case (s, n) =>
      s -> math.floor(math.sqrt(n.toDouble)).toLong }
    val sumRoots = roots.values.map(BigInt(_)).sum
    val targets = counts.map { case (s, n) =>
      s -> (BigInt(total) * roots(s) / sumRoots).toLong.min(n) }
      .filter(_._2 > 0)
    stratifiedSampleExact(df, strataCol, idCol, targets, seed, rangeParts)
  }

  /** Per-GROUP exact quantiles — [[exactQuantiles]] generalized with
    * the [[stratifiedSampleExact]] machinery: one range-partitioned
    * sort on (group, value), a bounded P×|groups| count collect, and
    * each group's target ranks read off as local indexes. No
    * whole-group window: a `row_number() OVER (PARTITION BY group)`
    * would pull each group into one task, and a web-scale group is
    * most of the corpus. Output: (group, q, value) ordered by
    * (group, q); rank semantics identical to [[exactQuantiles]]
    * (value at ⌊q·(N_g−1)⌋ of the group's sorted column). */
  def groupedQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[Double], rangeParts: Option[Int] = None): DataFrame = {
    require(qs.nonEmpty, "no quantiles requested")
    qs.foreach(q => require(q >= 0.0 && q <= 1.0, s"quantile out of [0,1]: $q"))
    val spark = df.sparkSession
    import org.apache.spark.sql.types.StringType
    // default follows session parallelism — see stratifiedSampleExact;
    // the targets collect is bounded by parts×|groups| regardless
    val parts = math.max(1, rangeParts.getOrElse(
      spark.sessionState.conf.numShufflePartitions))
    val ranged = df.select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull && col("g").isNotNull)
      .repartitionByRange(parts, col("g"), col("v"))
      .sortWithinPartitions("g", "v")
      .localCheckpoint() // two consumers — the repartitionByRange gotcha
    val slice = ranged
      .groupBy(spark_partition_id().as("pid"), col("g"))
      .agg(count(lit(1)).as("c"))
      .collect() // bounded: partitions × |groups|
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .sortBy(r => (r._2, r._1))
    // per group: total count and each partition's start offset, then
    // route every (group, q) target rank to its (pid, local index)
    val targets = scala.collection.mutable
      .Map.empty[Int, List[(String, Double, Long)]].withDefaultValue(Nil)
    slice.groupBy(_._2).foreach { case (g, rows) =>
      val total = rows.map(_._3).sum
      qs.foreach { q =>
        val r = math.floor(q * (total - 1)).toLong
        var before = 0L
        // rows are (pid, g, c) sorted by pid; find the owning pid
        val it = rows.iterator
        var placed = false
        while (!placed && it.hasNext) {
          val (pid, _, c) = it.next()
          if (r < before + c) {
            targets(pid) = (g, q, r - before) :: targets(pid)
            placed = true
          }
          before += c
        }
      }
    }
    val targetsB = spark.sparkContext.broadcast(
      targets.view.mapValues(_.groupBy(_._1).view
        .mapValues(_.map(t => (t._2, t._3)).sortBy(_._2)).toMap).toMap)
    val rows = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      targetsB.value.get(pid) match {
        case None => Iterator.empty
        case Some(byGroup) =>
          val out = Seq.newBuilder[Row]
          // stop scanning once every target routed to this partition
          // has been emitted — targets cluster at low local indexes
          // for small q, and the partition may hold millions of rows
          var remaining = byGroup.valuesIterator.map(_.size).sum
          var curG: String = null
          var i = 0L
          var want: Seq[(Double, Long)] = Nil
          var w = 0
          while (remaining > 0 && it.hasNext) {
            val row = it.next()
            val g = row.getString(0)
            if (g != curG) {
              curG = g; i = 0L; w = 0
              want = byGroup.getOrElse(g, Nil)
            }
            while (w < want.length && want(w)._2 == i) {
              out += Row(g, want(w)._1, row.getDouble(1))
              w += 1
              remaining -= 1
            }
            i += 1
          }
          out.result().iterator
      }
    }
    spark.createDataFrame(rows, StructType(Seq(
        StructField("group", StringType, nullable = false),
        StructField("q", DoubleType, nullable = false),
        StructField("value", DoubleType, nullable = false))))
      .orderBy("group", "q")
  }

  /** Exact quantiles by distributed rank selection — the single-group
    * degenerate case of [[groupedQuantiles]] (ONE range-partitioned
    * sort shuffle, bounded per-partition counts, target ranks read off
    * as local indexes; no global single-partition sort, no
    * approximation). Rank semantics: value at zero-based rank
    * ⌊q·(N−1)⌋ of the sorted column ("lower" discretization — an
    * element of the data, exactly replayable by `row_number`-based
    * SQL). Output: (q, value), ordered by q. Unlike the grouped form
    * — where an absent group is a legitimate empty answer — an empty
    * value column here is a caller error and fails loudly. */
  def exactQuantiles(df: DataFrame, valueCol: String,
      qs: Seq[Double]): DataFrame = {
    val nonNull = df.select(col(valueCol).cast("double").as("_v"))
      .filter(col("_v").isNotNull)
    require(!nonNull.isEmpty, s"exactQuantiles over an empty '$valueCol'")
    groupedQuantiles(nonNull.select(lit("all").as("_g"), col("_v")),
        "_g", "_v", qs)
      .select(col("q"), col("value"))
      .orderBy("q")
  }
}