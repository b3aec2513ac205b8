package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Sketch-first operators: a bounded approximate pass finds a small
  * candidate relation, an exact pass verifies it — so the output is
  * EXACT while the corpus-sized stream never shuffles on its raw key.
  * The same two-pass discipline as [[Dedup.decontaminateBloom]] (sketch
  * prefilter, exact verify) applied to frequency estimation.
  */
object Sketch {

  /** Per-partition Misra–Gries summary: at most `k` counters; every
    * token with local frequency > n_part/(k+1) is guaranteed to
    * survive (the classic MG undercount bound). Pure local state —
    * O(k) memory regardless of partition size. */
  private[graft] def misraGries(it: Iterator[String], k: Int)
      : (collection.mutable.HashMap[String, Long], Long) = {
    val counters = collection.mutable.HashMap.empty[String, Long]
    var n = 0L
    while (it.hasNext) {
      val tok = it.next()
      n += 1
      counters.get(tok) match {
        case Some(c) => counters.update(tok, c + 1)
        case None =>
          if (counters.size < k) counters.update(tok, 1L)
          else {
            // decrement-all; drop zeros (amortized O(1) per input)
            val dead = collection.mutable.ArrayBuffer.empty[String]
            counters.mapValuesInPlace((_, c) => c - 1)
            counters.foreach { case (t, c) => if (c <= 0) dead += t }
            dead.foreach(counters.remove)
          }
      }
    }
    (counters, n)
  }

  /** EXACT heavy hitters — every token with corpus frequency
    * >= ceil(phi * N) and its exact count — without ever shuffling the
    * corpus-sized token stream on the token key.
    *
    * Two passes (ref for the need: token_statistics-style corpus
    * reports; the method is Misra–Gries 1982 / the MG-merge result of
    * Agarwal 2013):
    *
    *  1. CANDIDATES — one scan; each partition keeps a Misra–Gries
    *     summary of k = ceil(1/phi) counters and emits only its
    *     surviving tokens plus one (null-token, n_part) row. The union
    *     of per-partition survivors is a SUPERSET of the true heavy
    *     hitters: if f >= phi*N globally then f_i >= phi*n_i on some
    *     partition (weighted pigeonhole), and MG with k counters keeps
    *     anything above n_i/(k+1) < phi*n_i. The emitted relation is
    *     bounded by P*k rows — never corpus-sized.
    *  2. VERIFY — second scan; tokens semi-joined against the
    *     BROADCAST candidate set (bounded, step 1), then counted
    *     exactly. Only candidate tokens enter the groupBy exchange, so
    *     the shuffle carries <= P * (distinct candidates) partial rows
    *     instead of the whole stream. The phi*N floor is applied with
    *     N from step 1's sentinel rows.
    *
    * At 100 TB: pass 1 is map-only with O(k) state; pass 2's exchange
    * is bounded by the candidate vocabulary, not the corpus. The
    * alternative — groupBy(token) over everything then HAVING — pays a
    * full corpus shuffle for a result that is a few dozen rows.
    *
    * Deterministic: MG survival depends on partition contents, but the
    * VERIFIED output (exact counts, exact floor) does not — any
    * candidate superset yields the same final relation, so the result
    * is partitioning-independent by construction.
    *
    * Output: (token, cnt) — exact counts, cnt desc, token asc. */
  def heavyHitters(df: DataFrame, textCol: String, phi: Double,
                   removeStopwords: Boolean = false): DataFrame = {
    require(phi > 0.0 && phi < 1.0, s"phi out of (0,1): $phi")
    val k = math.ceil(1.0 / phi).toInt
    val spark = df.sparkSession

    def tokens: DataFrame = df
      .select(explode(TextFunctions.tokensCol(col(textCol),
        removeStopwords = removeStopwords)).as("tok"))

    // pass 1: bounded per-partition summaries (P*k + P rows total)
    val sketch = tokens
      .as(Encoders.STRING)
      .mapPartitions { it =>
        val (counters, n) = misraGries(it, k)
        counters.keysIterator.map(t => (t, 0L)) ++ Iterator((null: String, n))
      }(Encoders.product[(String, Long)])
      .toDF("tok", "n_part")
      // two consumers: N and the candidate set. P*k rows; the caller
      // owns the (tiny) checkpoint's lifetime — session-scoped, like
      // Sampling's rank pins
      .localCheckpoint()
    val totals = sketch.filter(col("tok").isNull)
      .agg(sum("n_part").as("n_tok"))
    val candidates = sketch.filter(col("tok").isNotNull)
      .select("tok").distinct()

    // pass 2: exact counts of candidates only; floor on exact N
    tokens
      .join(broadcast(candidates), Seq("tok"), "left_semi")
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(totals))
      .filter(col("cnt") >= ceil(lit(phi) * col("n_tok")))
      .select(col("tok").as("token"), col("cnt"))
      .orderBy(col("cnt").desc, col("token"))
  }

  /** HyperLogLog distinct-count CALIBRATION (Flajolet 2007) — the
    * production cardinality sketch audited against the exact answer,
    * the ann_recall / quantiles_sampled discipline applied to
    * count-distinct. The sketch side is the 100 TB path: the hashed
    * stream folds into m = 2^b registers via ONE map-side-partial
    * max-aggregation (the exchange carries <= P*m rows), no
    * corpus-wide distinct shuffle; the exact side pays that shuffle
    * and exists only for the audit.
    *
    * Register construction is engine-replayable by design: h = first
    * 32 md5 bits, register j = h & (m-1), rank = position of the
    * first 1-bit in the remaining (32-b)-bit word via
    * `instr(lpad(bin(w)))` — pure integer/string ops. The register
    * sum Σ 2^-M_j is a sum of dyadic rationals spanning < 53 mantissa
    * bits, so it is EXACT and summation-order-independent; the final
    * ln/division is identical double arithmetic both engines.
    *
    * Estimator: raw alpha_m * m^2 / Z with the standard small-range
    * linear-counting branch (E <= 2.5m and empty registers exist).
    * Output (one row): (n_exact, n_estimate 4 dp, rel_error 4 dp). */
  def hllDistinctCalibration(df: DataFrame, valueCol: String,
                             b: Int = 8): DataFrame = {
    require(b >= 4 && b <= 16, s"b out of [4,16]: $b")
    val m = 1 << b
    val wBits = 32 - b
    val vals = df.select(col(valueCol).cast("string").as("_v"))
      .filter(col("_v").isNotNull)
    val h = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.HexSliceToLong(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(
          md5(col("_v").cast("binary"))), 0))
    val hashed = vals.select(
      (h.bitwiseAND(lit((m - 1).toLong))).as("j"),
      shiftright(h, b).as("w"))
    val regs = hashed
      .withColumn("rank", when(col("w") === 0L, lit(wBits + 1))
        .otherwise(instr(lpad(bin(col("w")), wBits, "0"), "1")))
      .groupBy("j").agg(max("rank").as("mj"))
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    val sketch = regs.agg(
      sum(pow(lit(2.0), -col("mj"))).as("z_present"),
      count(lit(1)).as("n_present"))
      .select(
        (col("z_present") +
          (lit(m.toDouble) - col("n_present"))).as("z"),
        (lit(m.toLong) - col("n_present")).as("v"))
      .select(
        (alpha * lit(m.toDouble) * lit(m.toDouble) / col("z"))
          .as("e_raw"), col("v"))
      .select(when(col("e_raw") <= lit(2.5 * m) && col("v") > 0L,
          lit(m.toDouble) * log(lit(m.toDouble) / col("v")))
        .otherwise(col("e_raw")).as("estimate"))
    val exact = vals.agg(count_distinct(col("_v")).as("n_exact"))
    exact.crossJoin(broadcast(sketch))
      .select(col("n_exact"),
        round(col("estimate"), 4).as("n_estimate"),
        round(abs(col("estimate") - col("n_exact").cast("double")) /
          col("n_exact"), 4).as("rel_error"))
  }

  /** PER-GROUP HyperLogLog — [[hllDistinctCalibration]] as the GROUP
    * BY aggregate it is in production (distinct tokens per source,
    * distinct users per day): registers keyed by (group, j), still ONE
    * map-side-partial max-aggregation whose exchange carries at most
    * P·|groups|·m rows — the per-group `count_distinct` it replaces
    * shuffles the corpus. The exact side exists only for the audit.
    * Register construction, dyadic register sum, and estimator
    * branches are [[hllDistinctCalibration]]'s verbatim.
    *
    * Output: (key, n_exact, n_estimate 4 dp, rel_error 4 dp), key asc. */
  def hllDistinctByKey(df: DataFrame, keyCol: String, valueCol: String,
                       b: Int = 8): DataFrame = {
    require(b >= 4 && b <= 16, s"b out of [4,16]: $b")
    val m = 1 << b
    val wBits = 32 - b
    val vals = df.select(col(keyCol).cast("string").as("_k"),
        col(valueCol).cast("string").as("_v"))
      .filter(col("_k").isNotNull && col("_v").isNotNull)
    val h = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.HexSliceToLong(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(
          md5(col("_v").cast("binary"))), 0))
    val hashed = vals.select(col("_k"),
      (h.bitwiseAND(lit((m - 1).toLong))).as("j"),
      shiftright(h, b).as("w"))
    val regs = hashed
      .withColumn("rank", when(col("w") === 0L, lit(wBits + 1))
        .otherwise(instr(lpad(bin(col("w")), wBits, "0"), "1")))
      .groupBy("_k", "j").agg(max("rank").as("mj"))
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    val sketch = regs.groupBy("_k").agg(
        sum(pow(lit(2.0), -col("mj"))).as("z_present"),
        count(lit(1)).as("n_present"))
      .select(col("_k"),
        (col("z_present") +
          (lit(m.toDouble) - col("n_present"))).as("z"),
        (lit(m.toLong) - col("n_present")).as("v"))
      .select(col("_k"),
        (alpha * lit(m.toDouble) * lit(m.toDouble) / col("z"))
          .as("e_raw"), col("v"))
      .select(col("_k"),
        when(col("e_raw") <= lit(2.5 * m) && col("v") > 0L,
          lit(m.toDouble) * log(lit(m.toDouble) / col("v")))
        .otherwise(col("e_raw")).as("estimate"))
    val exact = vals.groupBy("_k")
      .agg(count_distinct(col("_v")).as("n_exact"))
    exact.join(sketch, "_k")
      .select(col("_k").as("key"), col("n_exact"),
        round(col("estimate"), 4).as("n_estimate"),
        round(abs(col("estimate") - col("n_exact").cast("double")) /
          col("n_exact"), 4).as("rel_error"))
      .orderBy("key")
  }

  /** Count-min sketch frequency CALIBRATION (Cormode–Muthukrishnan
    * 2005) — the point-frequency sibling of [[hllDistinctCalibration]]
    * and [[heavyHitters]]: d independent hash rows × w counters,
    * counter (r, c) = #items with h_r(item) mod w = c, built by ONE
    * map-side-combinable groupBy over (r, c) — the exchange carries
    * at most P·d·w partial rows, never the corpus, and the sketch
    * relation is d·w rows regardless of input size. The point
    * estimate min_r counter(r, h_r(x)) is always an OVER-estimate
    * (every row counts x plus its colliders; the min picks the row
    * with the least collision mass — the classic ≤ εN w.h.p. bound
    * with ε = e/w over d = ln(1/δ) rows).
    *
    * The audit probes the top `probeK` items by EXACT count (ties to
    * item asc — a TakeOrdered cut, the exact side exists only for
    * calibration) and reports each probe's estimate and overestimate.
    * Hashes are the engine-replayable md5 32-bit slice of
    * `"r:item"`, so every count is an integer both engines derive
    * identically.
    *
    * Output: (token, n_exact, n_est, overestimate), n_exact desc,
    * token asc. */
  def cmsCalibration(df: DataFrame, valueCol: String, d: Int = 4,
                     wBits: Int = 8, probeK: Int = 20): DataFrame = {
    require(d >= 1 && d <= 16, s"d out of [1,16]: $d")
    require(wBits >= 4 && wBits <= 20, s"wBits out of [4,20]: $wBits")
    require(probeK >= 1, s"bad probeK: $probeK")
    val w = (1L << wBits)
    val vals = df.select(col(valueCol).cast("string").as("_v"))
      .filter(col("_v").isNotNull)
    def cellOf(r: Int, v: Column): Column = {
      val h = org.apache.spark.sql.graftbridge.ColumnBridge.column(
        graft.functions.HexSliceToLong(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(
            md5(concat(lit(s"$r:"), v).cast("binary"))), 0))
      h % w
    }
    val cells = vals.select(explode(array((0 until d).map(r =>
        struct(lit(r).as("r"), cellOf(r, col("_v")).as("c"))): _*))
      .as("rc"))
      .select(col("rc.r").as("r"), col("rc.c").as("c"))
    val sketch = cells.groupBy("r", "c").agg(count(lit(1)).as("cnt"))
    // the exact side: top-K probe relation (bounded), TakeOrdered cut
    val probes = vals.groupBy(col("_v"))
      .agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("_v"))
      .limit(probeK)
    val probeCells = probes.select(col("_v"), col("n_exact"),
      explode(array((0 until d).map(r =>
        struct(lit(r).as("r"), cellOf(r, col("_v")).as("c"))): _*))
        .as("rc"))
      .select(col("_v"), col("n_exact"),
        col("rc.r").as("r"), col("rc.c").as("c"))
    probeCells.join(broadcast(sketch), Seq("r", "c"))
      .groupBy("_v", "n_exact").agg(min("cnt").as("n_est"))
      .select(col("_v").as("token"), col("n_exact"), col("n_est"),
        (col("n_est") - col("n_exact")).as("overestimate"))
      .orderBy(col("n_exact").desc, col("token"))
  }

  /** Fixed-width histogram QUANTILE sketch with an exact audit — the
    * third sketch calibration beside HLL (distinct) and CMS
    * (frequency): one (min, max, N) pass, one MAP-ONLY bucket-count
    * pass into an `nBuckets`-row relation (mergeable across
    * partitions/streams — the shape a telemetry pipeline keeps), and
    * each quantile estimated as the RIGHT edge of the bucket holding
    * its target rank — so estimate ≥ exact and the normalized error
    * is ≤ 1/nBuckets + the bucket's mass skew, BY CONSTRUCTION. The
    * audit joins [[Sampling.exactQuantiles]]' rank selection (value at
    * floor(q·(N−1))) and reports (estimate − exact)/span.
    *
    * Scale: the corpus crosses the wire as nBuckets counters; the
    * cumulative window and the per-q pick run over the bounded
    * histogram relation only. */
  def histogramQuantiles(df: DataFrame, valueCol: String, nBuckets: Int,
                         qs: Seq[Double]): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 4096, s"bad nBuckets: $nBuckets")
    require(qs.nonEmpty && qs.forall(x => x >= 0.0 && x <= 1.0), s"$qs")
    val vals = df.select(col(valueCol).cast("double").as("_v"))
      .filter(col("_v").isNotNull)
    val mm = org.apache.spark.sql.functions.broadcast(
      vals.agg(min("_v").as("lo"), max("_v").as("hi"),
        count(lit(1)).as("n")))
    val hist = vals.crossJoin(mm)
      .select(when(col("hi") > col("lo"),
          least(floor((col("_v") - col("lo")) /
            (col("hi") - col("lo")) * nBuckets), lit(nBuckets - 1)))
        .otherwise(lit(0)).cast("int").as("b"))
      .groupBy("b").agg(count(lit(1)).as("cnt"))
    val wc = org.apache.spark.sql.expressions.Window.orderBy("b")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    // bounded window: ≤ nBuckets rows
    val cum = hist.withColumn("cum", sum("cnt").over(wc))
    val spark = df.sparkSession
    import spark.implicits._
    val est = qs.toDF("q").crossJoin(mm)
      .withColumn("target",
        (floor(col("q") * (col("n") - 1)) + 1).cast("long"))
      .join(cum, col("cum") >= col("target")) // |qs|×nBuckets, bounded
      .groupBy("q", "lo", "hi").agg(min("b").as("b"))
      .withColumn("estimate", when(col("hi") > col("lo"),
          col("lo") + (col("b") + 1).cast("double") *
            (col("hi") - col("lo")) / nBuckets)
        .otherwise(col("lo")))
      .withColumn("span", when(col("hi") > col("lo"),
        col("hi") - col("lo")).otherwise(lit(1.0)))
    est.join(Sampling.exactQuantiles(df, valueCol, qs), "q")
      .select(col("q"), col("value").as("exact"),
        round(col("estimate"), 6).as("estimate"),
        round((col("estimate") - col("value")) / col("span"), 6)
          .as("err_norm"))
      .orderBy("q")
  }

  /** The CLOSED count-min tuning loop ([[cmsCalibration]] measures;
    * this SELECTS — the third closed loop beside dedup_tuned and
    * ann_tuned): sweep widths `wBitsGrid`, pick the SMALLEST width
    * (cheapest memory) whose measured max probe overestimate is
    * ≤ `relBound`·N (N = total items — the ε·N form of the CMS
    * guarantee); if none qualifies, the largest width wins (total
    * rule, no data-dependent crash). The tuned sketch's probe table is
    * the result, the width it ran at on every row.
    *
    * One corpus pass builds ONLY the FINEST sketch: with power-of-two
    * widths, every coarser width FOLDS out of it —
    * cnt_w(r, c) = Σ_{c' ≡ c mod w} cnt_W(r, c') since w | W — so the
    * sweep costs one d·W-row aggregation plus |grid| folds over that
    * bounded relation, never |grid| corpus passes. */
  def cmsTuned(df: DataFrame, valueCol: String, d: Int = 4,
               wBitsGrid: Seq[Int] = Seq(4, 6, 8), probeK: Int = 20,
               relBound: Double = 0.02): DataFrame = {
    require(wBitsGrid.nonEmpty && wBitsGrid == wBitsGrid.sorted &&
      wBitsGrid.distinct == wBitsGrid, s"bad width grid: $wBitsGrid")
    require(wBitsGrid.forall(b => b >= 4 && b <= 20), s"$wBitsGrid")
    val wMax = 1L << wBitsGrid.max
    val vals = df.select(col(valueCol).cast("string").as("_v"))
      .filter(col("_v").isNotNull)
    def cellOf(r: Int, v: Column): Column = {
      val h = org.apache.spark.sql.graftbridge.ColumnBridge.column(
        graft.functions.HexSliceToLong(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(
            md5(concat(lit(s"$r:"), v).cast("binary"))), 0))
      h % wMax
    }
    val finest = vals.select(explode(array((0 until d).map(r =>
        struct(lit(r).as("r"), cellOf(r, col("_v")).as("c"))): _*))
        .as("rc"))
      .select(col("rc.r").as("r"), col("rc.c").as("c"))
      .groupBy("r", "c").agg(count(lit(1)).as("cnt"))
      .cache() // d·W rows; |grid| fold consumers + the tuned output
    val probes = vals.groupBy(col("_v"))
      .agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("_v"))
      .limit(probeK)
    def estAt(wBits: Int): DataFrame = {
      val w = 1L << wBits
      val sk = finest.groupBy(col("r"), (col("c") % w).as("c"))
        .agg(sum("cnt").as("cnt"))
      probes.select(col("_v"), col("n_exact"),
          explode(array((0 until d).map(r =>
            struct(lit(r).as("r"), (cellOf(r, col("_v")) % w).as("c"))
          ): _*)).as("rc"))
        .select(col("_v"), col("n_exact"),
          col("rc.r").as("r"), col("rc.c").as("c"))
        .join(broadcast(sk), Seq("r", "c"))
        .groupBy("_v", "n_exact").agg(min("cnt").as("n_est"))
    }
    // N from one row of the finest sketch (every row counts every item)
    val nTotal = finest.filter(col("r") === 0)
      .agg(coalesce(sum("cnt"), lit(0L))).collect()(0).getLong(0)
    // bounded selection collect: |grid| rows of (wBits, max overestimate)
    val sweep = wBitsGrid.map { wb =>
      val m = estAt(wb).agg(coalesce(max(col("n_est") - col("n_exact")),
        lit(0L))).collect()(0).getLong(0)
      (wb, m)
    }
    val chosen = sweep.find { case (_, m) =>
      m.toDouble <= relBound * nTotal
    }.map(_._1).getOrElse(wBitsGrid.max)
    estAt(chosen)
      .select(lit(chosen).as("wbits"), col("_v").as("token"),
        col("n_exact"), col("n_est"),
        (col("n_est") - col("n_exact")).as("overestimate"))
      .orderBy(col("n_exact").desc, col("token"))
  }
}
